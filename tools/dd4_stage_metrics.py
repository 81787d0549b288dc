"""One-off: run dd4 once at a given sf_dir and dump per-stage wall/cpu/
record metrics from the AppStatusStore to locate the expensive stage.

Usage: python tools/dd4_stage_metrics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/aristoteles_scale/sf1x100"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from aristoteles_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("dd4_metrics")
    q = em.queries()["dd4_minhash_lsh_pairs"]
    t0 = time.time()
    n = len(q(spark, sf_dir).collect())
    wall = time.time() - t0
    print(f"rows={n} wall={wall:.1f}s", flush=True)

    store = spark._jsparkSession.sharedState().statusStore()
    lst = store.stageList(None)
    rows = []
    for i in range(lst.size()):
        s = lst.apply(i)
        rows.append(
            (
                s.stageId(),
                s.executorRunTime() / 1000.0,
                s.executorCpuTime() / 1e9,
                s.inputRecords(),
                s.outputRecords(),
                s.shuffleReadRecords(),
                s.shuffleWriteRecords(),
                s.numCompleteTasks(),
            )
        )
    rows.sort(key=lambda r: -r[1])
    print("stage  runtime_s  cpu_s  in_rec  out_rec  shufR  shufW  tasks")
    for r in rows[:12]:
        print(f"{r[0]:>5}  {r[1]:>9.1f} {r[2]:>7.1f} {r[3]:>9} {r[4]:>8} {r[5]:>7} {r[6]:>7} {r[7]:>6}")


if __name__ == "__main__":
    main()

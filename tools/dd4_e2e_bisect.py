"""One-off: bisect dd4's end-to-end 100x wall (sweep measured 207x)
against its decomposed stages (61s): time the full query, then the
cross-branch-only and intra-branch-only aggregations, with the same
no-extra-persist shape the sweep runs.

Usage: python tools/dd4_e2e_bisect.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/aristoteles_scale/sf1x100"
    from aristoteles_spark.operators import dedup as D
    from aristoteles_spark.queries.dedup import BANDS, NUM_HASHES, q_minhash
    from aristoteles_spark.session import get_spark
    from aristoteles_spark.sources.parquet_source import fan_out, load_table

    spark = get_spark("dd4bisect")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup at the small scale like the sweep does
    t0 = time.time()
    q_minhash(spark, "/root/testdata/sf0.1").collect()
    print(f"warmup sf0.1: {time.time()-t0:.1f}s", flush=True)

    d = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_pairs(d, num_hashes=NUM_HASHES, bands=BANDS, threshold=0.5)

    agg = pairs.groupBy("doc_a").agg(
        F.count("*").alias("n_pairs"), F.max("est_sim").alias("max_est_sim")
    )
    t0 = time.time()
    n = agg.count()
    print(f"agg.count: {n} rows [{time.time()-t0:.1f}s]", flush=True)

    t0 = time.time()
    rows = agg.collect()
    print(f"agg.collect: {len(rows)} rows [{time.time()-t0:.1f}s]", flush=True)

    t0 = time.time()
    rows = agg.orderBy("doc_a").collect()
    print(f"agg.orderBy.collect: {len(rows)} rows [{time.time()-t0:.1f}s]", flush=True)


if __name__ == "__main__":
    main()

"""One-off diagnostic: time each stage of minhash_lsh_pairs at a given
sf_dir to locate the superlinear stage the 100x sweep flagged on dd4.

Usage: python tools/dd4_decompose.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def step(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {out} [{time.time() - t0:.1f}s]", flush=True)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/aristoteles_scale/sf1x100"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from aristoteles_spark.session import get_spark
    from aristoteles_spark.sources.parquet_source import fan_out, load_table
    from aristoteles_spark.operators import dedup as D

    spark = get_spark("dd4_decompose")
    d = fan_out(load_table(spark, sf_dir, "documents"))

    t0 = time.time()
    members = D.minhash_signatures(d, "text", "doc_id", 16).persist()
    step("members", members.count)
    uniq = members.groupBy("sig").agg(F.count("*").alias("n")).persist()
    step("uniq sigs", uniq.count)

    rows_per_band = 4
    bands = 4
    banded = uniq.select(
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.lit(bi), F.slice("sig", bi * rows_per_band + 1, rows_per_band))
                    for bi in range(bands)
                ]
            )
        ).alias("band", "band_digest"),
    ).persist()
    step("banded rows", banded.count)

    x = banded.select(F.col("sig").alias("sig_a"), "band", "band_digest")
    y = banded.select(F.col("sig").alias("sig_b"), "band", "band_digest")
    joined = x.join(y, ["band", "band_digest"])
    step("raw join output", joined.count)

    lt = joined.filter(F.col("sig_a") < F.col("sig_b"))
    step("after sig_a<sig_b", lt.count)

    earlier = None
    for bi in range(bands - 1):
        eq = (F.col("band") > bi) & (
            F.slice("sig_a", bi * rows_per_band + 1, rows_per_band)
            == F.slice("sig_b", bi * rows_per_band + 1, rows_per_band)
        )
        earlier = eq if earlier is None else (earlier | eq)
    fb = lt.filter(~earlier)
    step("after first-band", fb.count)

    matches = None
    for i in range(1, 17):
        m = (F.element_at("sig_a", i) == F.element_at("sig_b", i)).cast("int")
        matches = m if matches is None else matches + m
    sim = fb.withColumn("est_sim", matches / F.lit(16.0)).filter(F.col("est_sim") >= 0.5)
    step("after est_sim>=0.5", sim.count)

    m1 = members.select(F.col("doc").alias("da"), F.col("sig").alias("sig_a"))
    m2 = members.select(F.col("doc").alias("db"), F.col("sig").alias("sig_b"))
    cross = sim.join(F.broadcast(m1), "sig_a").join(F.broadcast(m2), "sig_b")
    step("doc-expanded cross", cross.count)

    g2 = members.select(F.col("doc").alias("db"), "sig")
    intra = (
        members.select(F.col("doc").alias("da"), "sig")
        .join(F.broadcast(g2), "sig")
        .filter((F.col("da") < F.col("db")) & F.forall("sig", lambda v: v.isNotNull()))
    )
    step("intra pairs", intra.count)
    print(f"TOTAL {time.time()-t0:.1f}s")


if __name__ == "__main__" and not (len(sys.argv) > 1 and sys.argv[1] == "--full"):
    main()


def full():
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/aristoteles_scale/sf1x100"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from aristoteles_spark.session import get_spark
    from aristoteles_spark.sources.parquet_source import fan_out, load_table
    from aristoteles_spark.operators.dedup import minhash_lsh_pairs

    spark = get_spark("dd4_full")
    d = fan_out(load_table(spark, sf_dir, "documents"))
    step("operator pairs", lambda: minhash_lsh_pairs(d, num_hashes=16, bands=4, threshold=0.5).count())
    import __spark_entry__ as em
    q = em.queries()["dd4_minhash_lsh_pairs"]
    step("full query rows", lambda: len(q(spark, sf_dir).collect()))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "--full":
    full()
    sys.exit(0)

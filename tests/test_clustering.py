"""k-means + HLL operator tests: the distributed formulations must match
independent pure-Python references on small fixtures (brute-force
nearest-centroid, per-dim floor-mean, register-level HLL), and the Lloyd
update must not increase inertia (the algorithm's defining invariant)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from aristoteles_spark.operators.clustering import (
    SCALE,
    assign,
    dist2q,
    pack_centroids,
    quantize,
    update,
)
from aristoteles_spark.operators.sketches import (
    HLL_C,
    HLL_M,
    HLL_RMAX,
    HLL_W_BITS,
    hll_distinct_estimate,
)

VECS = [
    (0, [0.1, 0.2, -0.3, 1.5]),
    (1, [0.11, 0.19, -0.31, 1.49]),
    (2, [-2.0, 0.5, 0.7, 0.0]),
    (3, [-1.9, 0.55, 0.65, -0.05]),
    (4, [5.0, 5.0, 5.0, 5.0]),
    (5, [4.9, 5.1, 5.0, 4.95]),
    (6, [0.0, 0.0, 0.0, 0.0]),
]
CENT_IDS = [0, 2, 4]


def _q(x):
    import math

    return math.floor(x * SCALE)


def _ref_assign(vecs, cents):
    """Brute force nearest on quantized coords, (dist, cid) tie-break."""
    out = {}
    for vid, v in vecs:
        vq = [_q(x) for x in v]
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(vq, [_q(x) for x in cv])), cid)
            for cid, cv in cents
        )
        out[vid] = best
    return out


@pytest.fixture(scope="module")
def vq(spark):
    df = spark.createDataFrame(VECS, ["vec_id", "embedding"]).select(
        "vec_id",
        quantize(F.col("embedding").cast("array<float>")).alias("xq"),
    )
    return df


def test_assign_matches_bruteforce(spark, vq):
    cents = vq.filter(F.col("vec_id").isin(CENT_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("xq").alias("cq")
    )
    got = {
        r["vec_id"]: (r["d2q"], r["cid"])
        for r in assign(vq, cents).collect()
    }
    ref_cents = [
        (vid, v) for vid, v in VECS if vid in CENT_IDS
    ]
    # float32 storage: quantize the float32-rounded values like Spark does
    import struct

    f32 = lambda xs: [struct.unpack("f", struct.pack("f", x))[0] for x in xs]
    want = _ref_assign([(i, f32(v)) for i, v in VECS], [(c, f32(v)) for c, v in ref_cents])
    assert got == want


def test_update_is_floor_mean(spark, vq):
    cents = vq.filter(F.col("vec_id").isin(CENT_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("xq").alias("cq")
    )
    a = assign(vq, cents)
    rows = {(r["cid"], r["dim"]): r["cq"] for r in update(a).collect()}
    members = {}
    for r in a.collect():
        members.setdefault(r["cid"], []).append(r["xq"])
    import math

    for cid, xs in members.items():
        for d in range(4):
            want = math.floor(sum(x[d] for x in xs) / len(xs))
            assert rows[(cid, d + 1)] == want, (cid, d)


def test_lloyd_update_never_increases_inertia(spark, vq):
    cents0 = vq.filter(F.col("vec_id").isin(CENT_IDS)).select(
        F.col("vec_id").alias("cid"), F.col("xq").alias("cq")
    )
    a1 = assign(vq, cents0)
    inertia1 = a1.agg(F.sum("d2q")).collect()[0][0]
    c1 = pack_centroids(update(a1))
    a2 = assign(vq, c1)
    inertia2 = a2.agg(F.sum("d2q")).collect()[0][0]
    # floor-quantized means can cost at most k*dim per coordinate unit;
    # on this fixture the drop is strict
    assert inertia2 <= inertia1


def test_dist2q_zero_iff_equal(spark, vq):
    d = vq.select(dist2q(F.col("xq"), F.col("xq")).alias("z")).collect()
    assert all(r["z"] == 0 for r in d)


# ---------------------------------------------------------------- HLL


def _h32(s: str) -> int:
    return int(hashlib.md5(f"0:{s}".encode()).hexdigest()[:8], 16)


def _ref_hll(values):
    regs = {}
    for v in set(values):
        h = _h32(str(v))
        idx, w = h >> HLL_W_BITS, h & ((1 << HLL_W_BITS) - 1)
        r = HLL_RMAX if w == 0 else HLL_RMAX - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), r)
    s_scaled = sum(1 << (HLL_RMAX - r) for r in regs.values())
    s_scaled += (HLL_M - len(regs)) * (1 << HLL_RMAX)
    return len(regs), s_scaled, HLL_C / s_scaled


def test_hll_matches_reference_registers(spark):
    vals = [f"key-{i * 7919}" for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    row = hll_distinct_estimate(df, "k").collect()[0]
    m_used, s_scaled, est = _ref_hll(vals)
    assert row["m_used"] == m_used
    assert row["s_scaled"] == s_scaled
    assert row["est_distinct"] == pytest.approx(est, rel=0, abs=0)
    # m=256 -> ~6.5% standard error; 1000 distinct keys must land close
    assert abs(row["est_distinct"] - 1000) / 1000 < 0.25


def test_hll_is_duplicate_insensitive(spark):
    base = [f"v{i}" for i in range(500)]
    df1 = spark.createDataFrame([(v,) for v in base], ["k"])
    df2 = spark.createDataFrame([(v,) for v in base * 3], ["k"])
    r1 = hll_distinct_estimate(df1, "k").collect()[0]
    r2 = hll_distinct_estimate(df2, "k").collect()[0]
    assert r1["s_scaled"] == r2["s_scaled"]
    assert r1["est_distinct"] == r2["est_distinct"]

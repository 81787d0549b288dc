"""Property-based tests (hypothesis) for operator invariants.

Each example builds one small DataFrame and compares a distributed operator
against an independent pure-Python model — the SURVEY §5 test strategy
(reference checks exact behavioral quirks; here the same idea is applied
to randomized inputs). Example counts are kept small because every example
runs Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --------------------------------------------------------------- salted agg
@PROP
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3)), min_size=1, max_size=60
    )
)
def test_salted_agg_matches_plain_groupby(spark, rows):
    from aristoteles_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(f"k{k}", v) for k, v in rows], "key string, v long"
    )
    got = {
        (r.key, r.n, r.s)
        for r in salted_agg(
            df,
            "key",
            {
                "n": (F.count(F.lit(1)), lambda c: F.sum(c)),
                "s": (F.sum("v"), lambda c: F.sum(c)),
            },
            salt_buckets=4,
            salt_on=F.col("v"),
        ).collect()
    }
    want = {
        (r.key, r.n, r.s)
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want


@PROP
@given(
    big=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=60
    ),
    small=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 9)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
)
def test_salted_join_matches_plain_join(spark, big, small):
    from aristoteles_spark.operators.skew import salted_join

    b = spark.createDataFrame(
        [(f"k{k}", v) for k, v in big], "key string, v long"
    )
    s = spark.createDataFrame(
        [(f"k{k}", w) for k, w in small], "key string, w long"
    )
    got = {
        (r.key, r.v, r.w)
        for r in salted_join(b, s, "key", salt_buckets=4, salt_on=F.col("v")).collect()
    }
    want = {(r.key, r.v, r.w) for r in b.join(s, "key").collect()}
    assert got == want


# ------------------------------------------------------ connected components
def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node id per component
    comp: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp[r] = min(comp.get(r, n), n)
    return {n: comp[find(n)] for n in nodes}


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_nodes=st.integers(2, 14),
    edge_idx=st.lists(st.tuples(st.integers(0, 13), st.integers(0, 13)), max_size=20),
)
def test_connected_components_matches_union_find(spark, n_nodes, edge_idx):
    from aristoteles_spark.operators.graph import connected_components

    nodes = list(range(1, n_nodes + 1))
    edges = [
        (a % n_nodes + 1, b % n_nodes + 1)
        for a, b in edge_idx
        if a % n_nodes != b % n_nodes
    ]
    ndf = spark.createDataFrame([(x,) for x in nodes], "doc long")
    edf = spark.createDataFrame(edges or [(1, 1)], "doc_a long, doc_b long")
    if not edges:
        edf = edf.filter("doc_a <> doc_a")
    got = {r.node: r.cluster for r in connected_components(ndf, edf).collect()}
    assert got == _union_find(nodes, edges)


# ------------------------------------------------------------------ MinHash
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    words=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=12
    ),
    perm=st.randoms(use_true_random=False),
)
def test_minhash_signature_is_order_invariant_and_dup_detecting(spark, words, perm):
    from aristoteles_spark.operators.dedup import minhash_signatures

    shuffled = list(words)
    perm.shuffle(shuffled)
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(shuffled))], "doc_id long, text string"
    )
    sigs = {r.doc: tuple(r.sig) for r in minhash_signatures(df, num_hashes=16).collect()}
    # same token SET (order/multiplicity ignored) -> identical signature
    assert sigs[1] == sigs[2]
    assert len(sigs[1]) == 16


# ------------------------------------------------------------- as-of join
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left_ts=st.lists(st.integers(0, 1000), min_size=1, max_size=15),
    right_ts=st.lists(st.integers(0, 1000), min_size=0, max_size=15),
)
def test_asof_join_picks_latest_at_or_before(spark, left_ts, right_ts):
    from aristoteles_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(i, 1, t) for i, t in enumerate(left_ts)], "event_id long, user_id long, ts long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    right = spark.createDataFrame(
        [(1000 + i, 1, t, float(t)) for i, t in enumerate(sorted(set(right_ts)))],
        "event_id long, user_id long, ts long, value double",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    out = asof_join(
        left, right, on="user_id", right_cols={"value": "matched_value"}
    ).collect()
    rights = sorted(set(right_ts))
    for r in out:
        t = int(r.ts.timestamp())
        at_or_before = [x for x in rights if x <= t]
        want = float(at_or_before[-1]) if at_or_before else None
        assert r.matched_value == want, (t, rights, r.matched_value, want)


# ---------------------------------------------------------------- KMV sketch
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(0, 10_000), min_size=1, max_size=200))
def test_kmv_exact_when_distinct_below_k(spark, vals):
    from aristoteles_spark.operators.sketches import kmv_distinct_estimate

    df = spark.createDataFrame([(v,) for v in vals], "x long")
    row = kmv_distinct_estimate(df, "x", k=256).collect()[0]
    assert row.est_distinct == float(len(set(vals)))


# ------------------------------------------------------ interval join (at2)
@PROP
@given(
    probe=st.lists(st.integers(0, 3000), min_size=1, max_size=20),
    build=st.lists(st.integers(0, 3000), min_size=0, max_size=20),
    radius=st.integers(1, 600),
)
def test_interval_join_binned_matches_bruteforce(spark, probe, build, radius):
    import datetime as dt

    from aristoteles_spark.operators.temporal import interval_join_binned

    base = dt.datetime(2024, 1, 1)
    p = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(probe)],
        "pid long, ts timestamp",
    )
    b = spark.createDataFrame(
        [(j, base + dt.timedelta(seconds=s)) for j, s in enumerate(build)],
        "bid long, ts timestamp",
    )
    got = {
        (r.pid, r._b_bid)
        for r in interval_join_binned(p, b, "ts", "ts", radius).collect()
    }
    want = {
        (i, j)
        for i, sp in enumerate(probe)
        for j, sb in enumerate(build)
        if abs(sb - sp) <= radius
    }
    assert got == want


# --------------------------------------------------- run collapse (dd8 core)
@PROP
@given(toks=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=30))
def test_repetition_scrub_matches_python_model(spark, toks):
    from aristoteles_spark.queries.dedup import q_repetition_scrub  # noqa: F401 (shape ref)

    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    kept = F.filter(
        F.split("text", " "),
        lambda x, i: (i == F.lit(0))
        | ~x.eqNullSafe(F.get(F.split(F.col("text"), " "), i - F.lit(1))),
    )
    got = df.select(F.array_join(kept, " ").alias("c")).collect()[0].c
    want = " ".join(
        x for i, x in enumerate(toks) if i == 0 or x != toks[i - 1]
    )
    assert got == want

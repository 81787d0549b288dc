"""Session-scoped materialization cache for cross-query shared tables.

A production curation pipeline writes its expensive intermediate tables
ONCE and consumes them many times: the near-dup cluster labeling feeds
the dedup keep-list, the leakage-free split, and any audit query; the
embedding near-dup edge set feeds semantic clustering, triangle census,
reachability, PageRank. Re-deriving those tables per query — what the
suite did through round 4 — re-runs the most expensive stages (MinHash
signatures + LSH banding, or the hyperplane bucket self-join) up to
five times per session (VERDICT r4 item 3: dd7 + p8 alone re-derived
the same contraction CC for ~13 s of the 247 s suite).

``shared_table`` memoizes a localCheckpointed table per (application,
key). The checkpoint is the stage seam a pipeline's table write would
be; the memo dict holding the DataFrame reference keeps its RDD blocks
alive across the bench runner's explicit GCs.

Plan-audit interplay: when ``SPARK_GRAFT_AUDIT_NO_BARRIER=1`` is set
(tools/plan_audit.py, the scale sweep's plan pass) the cache is
bypassed entirely — the builder's full strategy plan stays visible, and
nothing is checkpointed or memoized (audits only explain; they must not
poison the cache with un-checkpointed frames either).

Correctness interplay: every builder routed through here is
deterministic (fixed literals/seeds, exact arithmetic), so a memoized
table is value-identical to a rebuilt one; the driver's oracle compare
is unaffected by which query materialized it first.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aristoteles_spark.operators.barrier import barrier_disabled

_CACHE: dict[tuple, DataFrame] = {}

# one-time build cost per shared table, seconds, keyed by the table's
# label (key[0] of the caller's key tuple). bench.py publishes this as
# one_time_build_sec/per-table build times in BENCH_DETAIL so the
# untimed-warmup regime never silently absorbs real work (VERDICT r9
# item 2). Session-scoped like _CACHE; cleared with it.
BUILD_LOG: dict[str, float] = {}


def shared_table(
    spark: SparkSession, key: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the memoized localCheckpointed table for ``key``, building
    it on first use. Keys are scoped by applicationId so a new session
    (tests stop/start sessions) never sees another session's dead
    DataFrame handles; stale entries from previous sessions are dropped
    on access."""
    import os

    if barrier_disabled() or os.environ.get("SPARK_GRAFT_NO_SHARED_TABLES") == "1":
        # plan audit: full strategy plan must stay visible.
        # scale sweep (SPARK_GRAFT_NO_SHARED_TABLES=1): per-query
        # timings must charge each query its own build — a memo warm at
        # the small scale but cold at the big scale would corrupt the
        # growth ratios the sweep asserts on.
        return build()
    app = spark.sparkContext.applicationId
    full_key = (app, *key)
    df = _CACHE.get(full_key)
    if df is None:
        # drop handles from dead sessions (their checkpoint blocks died
        # with the session; holding the references only leaks memory)
        for k in [k for k in _CACHE if k[0] != app]:
            del _CACHE[k]
        import time

        t0 = time.time()
        df = build().localCheckpoint()
        label = str(key[0]) if key else "?"
        BUILD_LOG[label] = round(BUILD_LOG.get(label, 0.0) + time.time() - t0, 3)
        _CACHE[full_key] = df
    return df

"""Flag-aware stage barrier (the ``_finalize`` pattern, shared).

``localCheckpoint`` is the production stage seam — materialize a compact
intermediate ONCE instead of re-running its subtree per consumer — but
it replaces the plan with a checkpoint scan, which blinds
``tools/plan_audit.py``'s positive plan-pattern assertions and
``tools/scale_sweep``'s exchange-stability check to everything upstream
of the barrier (ADVICE r4: ir2's BroadcastHashJoin assertion was being
satisfied by a different, post-barrier join). Every barrier — operator-
level and query-level alike — must therefore route through this helper
so ``SPARK_GRAFT_AUDIT_NO_BARRIER=1`` (set by tools/plan_audit.py and
the scale sweep's plan pass) skips it and audits see the strategy plan
the checkpoint materialization would actually run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def barrier_disabled() -> bool:
    return os.environ.get("SPARK_GRAFT_AUDIT_NO_BARRIER") == "1"


def audit_barrier(
    df: DataFrame, *caches: DataFrame, eager: bool = True
) -> DataFrame:
    """``df.localCheckpoint(eager)`` then unpersist ``caches`` — unless
    the plan audit's ``SPARK_GRAFT_AUDIT_NO_BARRIER=1`` is set, in which
    case ``df`` is returned unchanged (caches are left alone too: the
    audit only explains plans, it does not execute them)."""
    if barrier_disabled():
        return df
    out = df.localCheckpoint(eager=eager)
    for c in caches:
        c.unpersist()
    return out

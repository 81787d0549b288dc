"""Declared query inventory: each module exports QUERIES (name ->
callable(spark, sf_dir) -> DataFrame) and ORACLE (name -> duckdb SQL).

Every SURVEY.md §2 operator has an entry here; __spark_entry__.py merges
the dicts for the driver's correctness gate.

Determinism rules (so Spark and duckdb value-hashes agree exactly):
- double SUMs go through DECIMAL casts (order-independent, exact);
- AVGs are computed as CAST(decimal_sum AS DOUBLE) / count — a single
  deterministic double division, no engine-rounding in play;
- every computed column is aliased identically on both sides;
- any LIMIT is preceded by a total ORDER BY on a unique key.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = [
    "relational",
    "tpch_shapes",
    "windows",
    "dedup",
    "similarity",
    "text",
    "multimodal",
    "streaming",
    "temporal",
    "analytics",
    "arrays",
]


def all_queries() -> dict:
    out = {}
    for m in _MODULES:
        try:
            mod = import_module(f"aristoteles_spark.queries.{m}")
        except ModuleNotFoundError:
            continue
        out.update(mod.QUERIES)
    return out


def all_oracle_sql() -> dict[str, str]:
    out = {}
    for m in _MODULES:
        try:
            mod = import_module(f"aristoteles_spark.queries.{m}")
        except ModuleNotFoundError:
            continue
        out.update(mod.ORACLE)
    return out

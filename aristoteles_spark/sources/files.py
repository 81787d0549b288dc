"""Delimited/JSON-lines file sources.

The reference reads only SQLite (aristoteles/aristoteles.py:318-343); a
complete engine also ingests the landing-zone formats a data pipeline
actually receives. Thin wrappers over Spark's native readers with the
defaults that matter at 100 TB:

- **Schema is required.** Inference scans the whole input once before the
  real job — at scale that doubles the read. Callers pass a DDL string or
  StructType.
- CSV/JSON scans still get column pruning; filter pushdown is limited for
  text formats (row-group/page skipping is a parquet/orc property), so
  these sources are for INGEST — convert to parquet/orc (sinks/) before
  repeated querying.
- ``columnNameOfCorruptRecord`` routes malformed rows to a column instead
  of failing the job mid-ingest (PERMISSIVE mode, the default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def load_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    header: bool = True,
    delimiter: str = ",",
    **options: str,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), sep=delimiter, **options)
        .csv(path)
    )


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    **options: str,
) -> DataFrame:
    """JSON-lines (one object per line — splittable, unlike multiline)."""
    return spark.read.schema(schema).options(**options).json(path)

"""Small-files compaction for partitioned parquet tables.

Incremental sinks (per-microbatch streaming writes, per-day pipeline
appends) fragment a table into many small files; at 100 TB the file-open
and listing overhead dominates scans long before the bytes do. Compaction
rewrites each partition's fragments into few right-sized files and
re-sorts rows within files on the clustering columns so parquet row-group
min/max statistics stay tight (the data-skipping property PLANS.md
documents).

Uses dynamic partition overwrite, so only partitions actually selected
are rewritten and a crashed compaction leaves untouched partitions
intact; re-running is idempotent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    where: str | None = None,
) -> int:
    """Rewrite fragmented partitions of the table at ``path``.

    ``where`` (SQL over the partition columns, e.g. "date >= '2024-01-01'")
    limits the rewrite to recent partitions — the steady-state pattern:
    compact yesterday's streaming output, leave history alone. Returns the
    number of rows rewritten.
    """
    df = spark.read.parquet(path)
    if where:
        # the predicate must touch only partition columns: a data-column
        # predicate would silently DROP the non-matching rows of every
        # rewritten partition (overwrite writes back just the selection)
        try:
            # analyze against a local relation holding ONLY the partition
            # columns (a projection of the real table would still resolve
            # data columns through the child via ResolveMissingReferences)
            from pyspark.sql.types import StructType

            part_schema = StructType(
                [f for f in df.schema.fields if f.name in partition_cols]
            )
            spark.createDataFrame([], part_schema).where(where).schema
        except Exception as e:
            raise ValueError(
                f"compaction `where` must reference only partition columns "
                f"{partition_cols}: {e}"
            ) from e
        df = df.where(where)
    # break lineage to the source files: Spark refuses to overwrite a path
    # its plan still reads. localCheckpoint materializes the selected rows
    # to executor block storage first. (On a cluster compacting very large
    # spans, write to a sibling temp dir and rename instead — same
    # semantics, no block-storage footprint.)
    df = df.localCheckpoint()
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if cluster_cols:
        out = out.sortWithinPartitions(*cluster_cols)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    back = spark.read.parquet(path)
    if where:
        back = back.where(where)
    return back.count()

"""Small-files compaction for partitioned parquet tables.

Incremental sinks (per-microbatch streaming writes, per-day pipeline
appends) fragment a table into many small files; at 100 TB the file-open
and listing overhead dominates scans long before the bytes do. Compaction
rewrites each partition's fragments into few right-sized files and
re-sorts rows within files on the clustering columns so parquet row-group
min/max statistics stay tight (the data-skipping property PLANS.md
documents).

Crash safety: the compacted copy is written to a sibling staging
directory first, and source partitions are swapped only after the whole
staged write is durable. Partitions NOT selected for compaction are
never touched. For a selected partition the swap is two renames
(current -> .bak, staged -> current, delete .bak), so a crash leaves
either the old or the new directory on disk — at worst a partition is
briefly renamed to its .bak sibling, which a re-run or a manual rename
restores. (An earlier in-place design held the only copy of the
rewritten rows in executor block storage while dynamic overwrite deleted
the originals; an executor loss mid-commit could drop a partition for
good.) On object stores without atomic rename, point ``path`` at a
transactional table format instead.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _leaf_partition_dirs(root: str) -> list[str]:
    """Relative paths of directories under ``root`` that hold data files."""
    leaves = []
    for cur, _dirs, files in os.walk(root):
        if any(not f.startswith(("_", ".")) for f in files):
            rel = os.path.relpath(cur, root)
            if rel != ".":
                leaves.append(rel)
    return leaves


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
        # rewritten partition (the swap replaces the whole partition dir)
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
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if cluster_cols:
        out = out.sortWithinPartitions(*cluster_cols)

    # stage the compacted copy beside the table (same filesystem, so the
    # later per-partition swaps are renames, not copies); a leading dot
    # keeps any sibling-level listing from picking it up
    parent, base = os.path.split(os.path.abspath(path.rstrip("/")))
    staging = os.path.join(parent, f".{base}.compact-{uuid.uuid4().hex[:8]}")
    try:
        (
            out.write.mode("overwrite")
            .option("maxRecordsPerFile", str(max_records_per_file))
            .partitionBy(*partition_cols)
            .parquet(staging)
        )
        rewritten = _leaf_partition_dirs(staging)
        for rel in rewritten:
            src = os.path.join(staging, rel)
            dest = os.path.join(path, rel)
            bak = dest.rstrip("/") + ".compact-bak"
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            if os.path.exists(bak):
                shutil.rmtree(bak)
            had_old = os.path.exists(dest)
            if had_old:
                os.rename(dest, bak)
            os.rename(src, dest)
            if had_old:
                shutil.rmtree(bak)
    finally:
        shutil.rmtree(staging, ignore_errors=True)

    back = spark.read.parquet(path)
    if where:
        back = back.where(where)
    return back.count()

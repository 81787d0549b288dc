"""SQLite ``archive`` table -> Spark DataFrame, with pushdown helpers.

The reference opens one SQLite DB per weather station and issues three SQL
statements (reference: aristoteles/aristoteles.py:229-241,303-306,339-346):

  #1  SELECT dateTime FROM archive ORDER BY dateTime LIMIT 1   (min probe)
  #2  SELECT COUNT() FROM archive WHERE dateTime BETWEEN ? AND ?  (gate)
  #3  SELECT <18 cols> FROM archive WHERE dateTime BETWEEN ? AND ?
      ORDER BY dateTime                                         (extract)

Design decision (SURVEY.md §4): default ingestion is driver-side
``sqlite3`` -> Arrow -> ``spark.createDataFrame``. Station archives are tiny
(288 rows/day); a JVM JDBC driver dependency buys nothing and SQLite's own
index on ``dateTime`` already gives us pushdown for the scalar probes. For
the scale path, ``read_archive_jdbc`` builds the equivalent JDBC reader with
partitioned reads (requires the sqlite-jdbc jar on the classpath; gated).

Pushdown policy: the scalar probes (#1, #2) are answered by SQLite directly
— shipping whole tables to Spark to compute a MIN or COUNT would invert the
reference's own pushdown. The bulk extract (#3) optionally pushes the
BETWEEN range into the SQLite query so only the needed days cross the
boundary, mirroring predicate pushdown a DSv2 source would do.
"""

from __future__ import annotations

import sqlite3
from typing import Iterable

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aristoteles_spark.schema import ARCHIVE_COLUMNS, ARCHIVE_SCHEMA, MEASURES

_SELECT_LIST = ", ".join(ARCHIVE_COLUMNS)


def _arrow_from_rows(rows: list[tuple]) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in ARCHIVE_COLUMNS]
    arrays = [
        pa.array(cols[0], type=pa.int64()),
        pa.array(cols[1], type=pa.int32()),
    ] + [pa.array(cols[i + 2], type=pa.float64()) for i in range(len(MEASURES))]
    return pa.table(dict(zip(ARCHIVE_COLUMNS, arrays)))


def read_archive(
    spark: SparkSession,
    db_path: str,
    lo: int | None = None,
    hi: int | None = None,
) -> DataFrame:
    """Load (a time range of) one station's ``archive`` as a DataFrame.

    ``lo``/``hi`` are inclusive epoch-second bounds pushed down into SQLite
    (mirrors reference SQL #3, aristoteles.py:340-345, including inclusive
    BETWEEN semantics).
    """
    where, params = "", ()
    if lo is not None or hi is not None:
        where = " WHERE dateTime BETWEEN ? AND ?"
        params = (lo if lo is not None else -(2**62), hi if hi is not None else 2**62)
    with sqlite3.connect(db_path) as conn:
        rows = conn.execute(
            f"SELECT {_SELECT_LIST} FROM archive{where} ORDER BY dateTime", params
        ).fetchall()
    return spark.createDataFrame(_arrow_from_rows(rows).to_pandas(), schema=ARCHIVE_SCHEMA)


def min_datetime(db_path: str) -> int | None:
    """Earliest record time (reference SQL #1, aristoteles.py:240-241).

    Expressed as MIN — SQLite answers from the dateTime index either way;
    semantically identical to the reference's ORDER BY ... LIMIT 1.
    """
    with sqlite3.connect(db_path) as conn:
        row = conn.execute("SELECT MIN(dateTime) FROM archive").fetchone()
    return row[0] if row and row[0] is not None else None


def ranged_count(db_path: str, lo: int, hi: int) -> int:
    """Completeness-gate count (reference SQL #2, aristoteles.py:303-306)."""
    with sqlite3.connect(db_path) as conn:
        row = conn.execute(
            "SELECT COUNT(*) FROM archive WHERE dateTime BETWEEN ? AND ?", (lo, hi)
        ).fetchone()
    return int(row[0])


def read_stations(
    spark: SparkSession,
    stations: dict[str, str],
    lo: int | None = None,
    hi: int | None = None,
) -> DataFrame:
    """Union all stations into the engine's canonical long form.

    Adds a ``station`` column (the reference's per-station HDF5 group name,
    aristoteles.py:408-440). unionByName of per-station frames — narrow, no
    shuffle; downstream partitioning is by (day) at the sink.
    """
    dfs = [
        read_archive(spark, path, lo, hi).withColumn("station", F.lit(name))
        for name, path in stations.items()
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.select("station", *ARCHIVE_COLUMNS)


def read_archive_jdbc(
    spark: SparkSession,
    db_path: str,
    num_partitions: int = 8,
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """EXPERIMENTAL: JDBC reader with range-partitioned parallel reads.

    Partitions on the indexed ``dateTime`` PK so each task reads a disjoint
    time slice (predicate pushdown keeps the BETWEEN in SQLite). Requires
    org.xerial:sqlite-jdbc on the Spark classpath — a jar this environment
    cannot fetch (no network, installs prohibited), so this path is
    UNTESTED end-to-end and is not claimed as the scale path; the Arrow
    reader (``read_archive``) is the supported ingest. The partition-bound
    construction is unit-tested; the .load() is gated with a clear error.
    Kept because on a real cluster (jar present) it is the idiomatic
    parallel-ingest shape for a large SQLite archive.
    """
    if bounds is None:
        with sqlite3.connect(db_path) as conn:
            row = conn.execute("SELECT MIN(dateTime), MAX(dateTime) FROM archive").fetchone()
        if row is None or row[0] is None:
            raise ValueError(f"empty archive: {db_path}")
        bounds = (int(row[0]), int(row[1]))
    reader = (
        spark.read.format("jdbc")
        .option("url", f"jdbc:sqlite:{db_path}")
        .option("dbtable", "archive")
        .option("driver", "org.sqlite.JDBC")
        .option("partitionColumn", "dateTime")
        .option("lowerBound", str(bounds[0]))
        .option("upperBound", str(bounds[1] + 1))
        .option("numPartitions", str(num_partitions))
    )
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - depends on classpath
        raise RuntimeError(
            "sqlite-jdbc driver not on classpath; use read_archive() (Arrow path)"
        ) from e


def write_archive_sqlite(db_path: str, rows: Iterable[tuple]) -> None:
    """Test helper: materialize a wview-shaped archive SQLite DB."""
    with sqlite3.connect(db_path) as conn:
        conn.execute(
            "CREATE TABLE IF NOT EXISTS archive ("
            "dateTime INTEGER NOT NULL PRIMARY KEY, usUnits INTEGER NOT NULL, "
            + ", ".join(f"{m} REAL" for m in MEASURES)
            + ")"
        )
        conn.executemany(
            f"INSERT OR REPLACE INTO archive ({_SELECT_LIST}) VALUES "
            f"({', '.join('?' * len(ARCHIVE_COLUMNS))})",
            rows,
        )
        conn.commit()

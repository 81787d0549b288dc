"""SQLite ``archive`` table -> Spark DataFrame, with pushdown helpers.

The reference opens one SQLite DB per weather station and issues three SQL
statements (reference: aristoteles/aristoteles.py:229-241,303-306,339-346):

  #1  SELECT dateTime FROM archive ORDER BY dateTime LIMIT 1   (min probe)
  #2  SELECT COUNT() FROM archive WHERE dateTime BETWEEN ? AND ?  (gate)
  #3  SELECT <18 cols> FROM archive WHERE dateTime BETWEEN ? AND ?
      ORDER BY dateTime                                         (extract)

Design decision (SURVEY.md §4): default ingestion for the incremental
CLI pipeline is driver-side ``sqlite3`` -> Arrow -> ``createDataFrame``.
Station archives are tiny per day (288 rows); SQLite's own index on
``dateTime`` already gives us pushdown for the scalar probes. The SCALE
path — bulk backfills over many stations/years — is the ``wview``
Python Data Source (``sources/wview_datasource.py``): day-partitioned
parallel executor-side reads with dateTime/station filter pushdown, no
JVM driver dependency.

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

"""HDF5 export: the reference's exact daily file layout, from a Spark day.

The engine's canonical sink is date-partitioned Parquet (daily_parquet.py);
this module reproduces the reference's HDF5 structure byte-for-byte in
*shape* for downstream readers that still expect it
(aristoteles/aristoteles.py:392-468):

  /                       attrs: git_version_tag, system_user,
                          collection_server, instrument_name,
                          archive_version, acquisition_name,
                          acquisition_type            (aristoteles.py:393-402)
  /index_map/station_time_<station>   float64 time axis per station
                                               (aristoteles.py:404-405,438)
  /<station>              attrs: wview_database, longitude/latitude
                          (NaN when absent), description ("" when absent)
                                               (aristoteles.py:443-458)
  /<station>/<measure>    1-D float64 dataset, attrs axis=[...], units
                                               (aristoteles.py:460-464)

A day is <=288 rows per station (README.md:9-10), so collecting it to the
driver for the file write is the same single-writer shape as the
reference — the distributed work (scan, convert, order) happens in Spark
before this step.

``build_layout`` is pure (no h5py) and fully testable in this container;
``export_day_h5`` writes a real ``.h5`` file either via h5py (when
installed) or via the self-contained pure-Python writer in
``formats/minihdf5.py`` (implements the public HDF5 file format spec:
superblock v2, v2 object headers, compact links, contiguous float64
datasets — exactly this layout's needs). The pure path is round-trip
verified in-container by ``formats.minihdf5.read_hdf5``.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame

from aristoteles_spark.schema import MEASURE_TYPES, MEASURES, UNITS
from aristoteles_spark.sinks.daily_parquet import global_attrs, station_attrs

try:  # gated: h5py is not in this environment
    import h5py  # type: ignore
except ImportError:  # pragma: no cover
    h5py = None


def build_layout(
    day_df: DataFrame,
    instrument: str,
    acq: str,
    stations_conf: dict[str, dict] | None = None,
) -> dict[str, Any]:
    """Collect one day and arrange it as the reference's HDF5 structure.

    Returns {"attrs": {...}, "index_map": {station: [float64 times]},
    "groups": {station: {"attrs": {...}, "datasets": {measure:
    {"values": [...], "axis": [...], "units": str}}}}}. Rows are
    time-ordered per station (the reference's ORDER BY dateTime,
    aristoteles.py:343); NULL measures surface as NaN (the np.asarray
    float cast, aristoteles.py:346).
    """
    rows = (
        day_df.select("station", "dateTime", *MEASURES)
        .orderBy("station", "dateTime")
        .collect()
    )
    per_station: dict[str, list] = {}
    for r in rows:
        per_station.setdefault(r["station"], []).append(r)

    sattrs = station_attrs(stations_conf or {})
    groups = {}
    index_map = {}
    for station, srows in per_station.items():
        axis = f"station_time_{station}"
        index_map[station] = [float(r["dateTime"]) for r in srows]
        datasets = {}
        for m in MEASURES:
            vals = [
                float("nan") if r[m] is None or (isinstance(r[m], float) and math.isnan(r[m])) else float(r[m])
                for r in srows
            ]
            datasets[m] = {
                "values": vals,
                "axis": [axis],
                "units": UNITS[MEASURE_TYPES[m]],
            }
        groups[station] = {
            "attrs": sattrs.get(
                station,
                {"wview_database": "", "longitude": float("nan"),
                 "latitude": float("nan"), "description": ""},
            ),
            "datasets": datasets,
        }
    return {
        "attrs": global_attrs(instrument, acq),
        "index_map": index_map,
        "groups": groups,
    }


def export_day_h5(
    day_df: DataFrame,
    path: str,
    instrument: str,
    acq: str,
    stations_conf: dict[str, dict] | None = None,
) -> dict[str, Any]:
    """Write ``path`` in the reference's daily HDF5 layout. Returns the
    layout written. Uses h5py when installed, else the pure-Python
    minihdf5 writer (same structure, HDF5 1.8 'latest' on-disk format)."""
    layout = build_layout(day_df, instrument, acq, stations_conf)
    if h5py is None:
        from aristoteles_spark.formats.minihdf5 import MiniHDF5Writer

        w = MiniHDF5Writer()
        w.root.attrs.update(layout["attrs"])
        imap = w.root.create_group("index_map")
        for station, times in layout["index_map"].items():
            imap.create_dataset(f"station_time_{station}", times, dtype="f8")
        for station, g in layout["groups"].items():
            grp = w.root.create_group(station)
            grp.attrs.update(g["attrs"])
            for m, d in g["datasets"].items():
                grp.create_dataset(
                    m, d["values"], dtype="f8",
                    attrs={"axis": d["axis"], "units": d["units"]},
                )
        w.write(path)
        return layout
    with h5py.File(path, "w") as f:  # pragma: no cover (no h5py here)
        for k, v in layout["attrs"].items():
            f.attrs[k] = v
        imap = f.create_group("index_map")
        for station, times in layout["index_map"].items():
            imap.create_dataset(f"station_time_{station}", data=times, dtype="f8")
        for station, g in layout["groups"].items():
            grp = f.create_group(station)
            for k, v in g["attrs"].items():
                grp.attrs[k] = v
            for m, d in g["datasets"].items():
                ds = grp.create_dataset(m, data=d["values"], dtype="f8")
                ds.attrs["axis"] = d["axis"]
                ds.attrs["units"] = d["units"]
    return layout

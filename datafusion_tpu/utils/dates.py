"""Date32 arithmetic: days since the Unix epoch (1970-01-01) ↔ civil
calendar. Physical storage is int32, so every device operator (compare,
sort, group, join, MIN/MAX, windows) works on dates with zero changes.

The civil↔days conversions are Howard Hinnant's public-domain era-based
algorithms — branch-free integer arithmetic, so the device versions
(YEAR/MONTH/DAY extraction) vectorize straight onto the VPU.
"""

from __future__ import annotations

import datetime

import jax.numpy as jnp
import numpy as np


def days_from_civil(y: int, m: int, d: int) -> int:
    """Civil date → days since 1970-01-01 (host scalar)."""
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def parse_iso_date(s: str) -> int:
    """'YYYY-MM-DD' → days since epoch; raises ValueError on bad input."""
    d = datetime.date.fromisoformat(s.strip())
    return days_from_civil(d.year, d.month, d.day)


def date_of_days(days: int) -> datetime.date:
    return datetime.date(1970, 1, 1) + datetime.timedelta(days=int(days))


def format_days(days: int) -> str:
    return date_of_days(days).isoformat()


def _civil_from_days_dev(z):
    """Vectorized days-since-epoch → (year, month, day), device arrays."""
    z = z.astype(jnp.int32) + 719468
    era = jnp.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = jnp.where(mp < 10, mp + 3, mp - 9)
    y = y + (m <= 2)
    return y.astype(jnp.int32), m.astype(jnp.int32), d.astype(jnp.int32)


def extract_year(days):
    return _civil_from_days_dev(days)[0]


def extract_month(days):
    return _civil_from_days_dev(days)[1]


def extract_day(days):
    return _civil_from_days_dev(days)[2]


def to_days_array(values) -> np.ndarray:
    """Host conversion of a python/numpy date-ish column to int32 days:
    accepts datetime.date / datetime64 arrays / ISO strings / ints."""
    arr = np.asarray(values)
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[D]").astype(np.int64).astype(np.int32)
    if np.issubdtype(arr.dtype, np.integer):
        return arr.astype(np.int32)
    out = np.empty(len(arr), dtype=np.int32)
    for i, v in enumerate(arr):
        if isinstance(v, datetime.date):
            out[i] = days_from_civil(v.year, v.month, v.day)
        else:
            out[i] = parse_iso_date(str(v))
    return out


# ---------------------------------------------------------------------------
# Timestamp: seconds since the Unix epoch (fractional seconds truncate).
# ---------------------------------------------------------------------------

def parse_iso_timestamp(s: str) -> int:
    """'YYYY-MM-DD[ |T]HH:MM:SS[.frac]' (or a bare date = midnight) →
    seconds since epoch; raises ValueError on bad input."""
    s = s.strip()
    dt = datetime.datetime.fromisoformat(s.replace(" ", "T", 1) if " " in s else s)
    if dt.tzinfo is not None:
        dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    days = days_from_civil(dt.year, dt.month, dt.day)
    return days * 86400 + dt.hour * 3600 + dt.minute * 60 + dt.second


def datetime_of_seconds(secs: int) -> datetime.datetime:
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(seconds=int(secs))


def format_seconds(secs: int) -> str:
    """'YYYY-MM-DD HH:MM:SS' rendering."""
    return datetime_of_seconds(secs).isoformat(sep=" ")


def _days_of_seconds_dev(secs):
    return jnp.floor_divide(secs, 86400).astype(jnp.int32)


def _second_of_day_dev(secs):
    return (secs - jnp.floor_divide(secs, 86400) * 86400).astype(jnp.int32)


def ts_extract_year(secs):
    return extract_year(_days_of_seconds_dev(secs))


def ts_extract_month(secs):
    return extract_month(_days_of_seconds_dev(secs))


def ts_extract_day(secs):
    return extract_day(_days_of_seconds_dev(secs))


def ts_extract_hour(secs):
    return _second_of_day_dev(secs) // 3600


def ts_extract_minute(secs):
    return (_second_of_day_dev(secs) // 60) % 60


def ts_extract_second(secs):
    return _second_of_day_dev(secs) % 60


def to_seconds_array(values) -> np.ndarray:
    """Host conversion of a datetime-ish column to int64 seconds: accepts
    datetime.datetime / datetime64 arrays / ISO strings / ints."""
    arr = np.asarray(values)
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[s]").astype(np.int64)
    if np.issubdtype(arr.dtype, np.integer):
        return arr.astype(np.int64)
    out = np.empty(len(arr), dtype=np.int64)
    for i, v in enumerate(arr):
        if isinstance(v, datetime.datetime):
            out[i] = (
                days_from_civil(v.year, v.month, v.day) * 86400
                + v.hour * 3600 + v.minute * 60 + v.second
            )
        elif isinstance(v, datetime.date):
            out[i] = days_from_civil(v.year, v.month, v.day) * 86400
        else:
            out[i] = parse_iso_timestamp(str(v))
    return out


# ---------------------------------------------------------------------------
# INTERVAL arithmetic (beyond the reference).
# ---------------------------------------------------------------------------

def _days_from_civil_dev(y, m, d):
    """Vectorized civil date → days since epoch (device arrays)."""
    y = y - (m <= 2)
    era = jnp.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + jnp.where(m > 2, -3, 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return (era * 146097 + doe - 719468).astype(jnp.int32)


def _days_in_month_dev(y, m):
    lengths = jnp.asarray([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
                          dtype=jnp.int32)
    base = lengths[m - 1]
    leap = jnp.logical_or(
        jnp.logical_and(y % 4 == 0, y % 100 != 0), y % 400 == 0
    )
    return jnp.where(jnp.logical_and(m == 2, leap), 29, base)


def add_months_days(days, n: int):
    """days-since-epoch + n calendar months, day-of-month clamped to the
    target month's length (SQL convention: Jan 31 + 1 MONTH = Feb 28/29)."""
    y, m, d = _civil_from_days_dev(days)
    total = y * 12 + (m - 1) + jnp.int32(n)
    y2 = jnp.floor_divide(total, 12)
    m2 = total - y2 * 12 + 1
    d2 = jnp.minimum(d, _days_in_month_dev(y2, m2))
    return _days_from_civil_dev(y2, m2, d2)


def add_months_seconds(secs, n: int):
    """seconds-since-epoch + n calendar months (time of day preserved)."""
    days = _days_of_seconds_dev(secs)
    sod = _second_of_day_dev(secs)
    d2 = add_months_days(days, n)
    return d2.astype(secs.dtype) * 86400 + sod.astype(secs.dtype)


# ---------------------------------------------------------------------------
# Extra EXTRACT fields and DATE_TRUNC (beyond the reference).
# ---------------------------------------------------------------------------

def extract_dow(days):
    """Day of week, Sunday = 0 (Postgres DOW). 1970-01-01 was a Thursday."""
    return jnp.remainder(days.astype(jnp.int32) + 4, 7)


def _isoweekday_dev(days):
    """ISO weekday, Monday = 1 .. Sunday = 7."""
    return jnp.remainder(days.astype(jnp.int32) + 3, 7) + 1


def extract_doy(days):
    y, _, _ = _civil_from_days_dev(days)
    jan1 = _days_from_civil_dev(y, jnp.ones_like(y), jnp.ones_like(y))
    return days.astype(jnp.int32) - jan1 + 1


def extract_quarter(days):
    m = extract_month(days)
    return (m - 1) // 3 + 1


def extract_week(days):
    """ISO 8601 week number (1..53)."""
    y, _, _ = _civil_from_days_dev(days)
    doy = extract_doy(days)
    wd = _isoweekday_dev(days)
    w = (doy - wd + 10) // 7

    def weeks_in(yy):
        jan1 = _days_from_civil_dev(yy, jnp.ones_like(yy), jnp.ones_like(yy))
        jan1_wd = _isoweekday_dev(jan1)
        leap = jnp.logical_or(
            jnp.logical_and(yy % 4 == 0, yy % 100 != 0), yy % 400 == 0
        )
        return 52 + jnp.where(
            jnp.logical_or(jan1_wd == 4, jnp.logical_and(leap, jan1_wd == 3)),
            1,
            0,
        )

    # order matters: the year-boundary adjustments use the RAW w
    w_adj = jnp.where(w > weeks_in(y), 1, w)  # week 53 of a 52-week year
    return jnp.where(w < 1, weeks_in(y - 1), w_adj).astype(jnp.int32)


def date_trunc_days(days, unit: str):
    """Truncate days-since-epoch to the unit boundary (returns days)."""
    d32 = days.astype(jnp.int32)
    if unit == "day":
        return d32
    if unit == "week":  # ISO week starts Monday
        return d32 - (_isoweekday_dev(d32) - 1)
    y, m, _ = _civil_from_days_dev(d32)
    one = jnp.ones_like(y)
    if unit == "month":
        return _days_from_civil_dev(y, m, one)
    if unit == "quarter":
        qm = ((m - 1) // 3) * 3 + 1
        return _days_from_civil_dev(y, qm, one)
    if unit == "year":
        return _days_from_civil_dev(y, one, one)
    raise ValueError(f"unsupported DATE_TRUNC unit {unit!r}")


def date_trunc_seconds(secs, unit: str):
    """Truncate seconds-since-epoch to the unit boundary (returns seconds)."""
    if unit == "second":
        return secs
    if unit == "minute":
        return secs - jnp.remainder(secs, 60)
    if unit == "hour":
        return secs - jnp.remainder(secs, 3600)
    days = _days_of_seconds_dev(secs)
    return date_trunc_days(days, unit).astype(secs.dtype) * 86400


def ts_extract_dow(secs):
    return extract_dow(_days_of_seconds_dev(secs))


def ts_extract_doy(secs):
    return extract_doy(_days_of_seconds_dev(secs))


def ts_extract_quarter(secs):
    return extract_quarter(_days_of_seconds_dev(secs))


def ts_extract_week(secs):
    return extract_week(_days_of_seconds_dev(secs))

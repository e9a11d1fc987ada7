"""Model calendar: 365-day year with the reference's leap-day quirk.

Reference: source/date.f90. The calendar is 365 days (ncal=365, date.f90:32)
but `newdate` lets February run to 29 days in years divisible by 4
(date.f90:129-139) — reproduced as-is. Also provides the monthly
interpolation weights (interpolation.f90) as 12-vectors for device-side
einsum interpolation.
"""
from __future__ import annotations

import dataclasses

import numpy as np

NDAYCAL = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
NCAL = 365
_CUM = np.concatenate([[0], np.cumsum(NDAYCAL)[:-1]])


@dataclasses.dataclass(frozen=True)
class Datetime:
    year: int
    month: int
    day: int
    hour: int = 0
    minute: int = 0

    def key(self):
        return (self.year, self.month, self.day, self.hour, self.minute)

    def __eq__(self, other):
        return self.key() == other.key()

    def __lt__(self, other):
        return self.key() < other.key()

    def __le__(self, other):
        return self.key() <= other.key()


def newdate(d: Datetime, nsteps: int) -> Datetime:
    """Advance by one model step (date.f90:109-157)."""
    minute = d.minute + int(24 * 60 / nsteps)
    hour, day, month, year = d.hour, d.day, d.month, d.year
    if minute >= 60:
        hour += 1
        minute = minute % 60
    if hour >= 24:
        hour = hour % 24
        day += 1
    if year % 4 == 0 and month == 2:
        if day > 29:  # reference leap-day quirk (date.f90:129-133)
            day = 1
            month += 1
    else:
        if day > NDAYCAL[month - 1]:
            day = 1
            month += 1
    if month > 12:
        month = 1
        year += 1
    return Datetime(year, month, day, hour, minute)


def next_day(d: Datetime) -> Datetime:
    """The date one calendar day later (same rollover rules as newdate,
    incl. the leap-February quirk, date.f90:129-139)."""
    day, month, year = d.day + 1, d.month, d.year
    if year % 4 == 0 and month == 2:
        if day > 29:
            day = 1
            month += 1
    else:
        if day > NDAYCAL[month - 1]:
            day = 1
            month += 1
    if month > 12:
        month = 1
        year += 1
    return Datetime(year, month, day, d.hour, d.minute)


def season_vars(d: Datetime, iseasc: int = 1, start_month: int = 1):
    """(imont1, tmonth, tyear) (date.f90:97-105)."""
    if iseasc >= 1:
        imont1 = d.month
        tmonth = (d.day - 0.5) / NDAYCAL[d.month - 1]
        tyear = (_CUM[d.month - 1] + d.day - 0.5) / NCAL
    else:
        imont1 = start_month
        tmonth = 0.5
        tyear = (_CUM[imont1 - 1] + 0.5 * _CUM[imont1 - 1]) / NCAL
    return imont1, tmonth, tyear


def forint_weights(imon: int, tmonth: float, n: int = 12) -> np.ndarray:
    """Linear month-interpolation weights (interpolation.f90:16-35),
    1-based month index -> [n] weight vector."""
    w = np.zeros(n)
    if tmonth <= 0.5:
        imon2 = imon - 1 if imon > 1 else n
        wmon = 0.5 - tmonth
    else:
        imon2 = imon + 1 if imon < n else 1
        wmon = tmonth - 0.5
    w[imon - 1] += 1.0 - wmon
    w[imon2 - 1] += wmon
    return w


def forin5_weights(imon: int, tmonth: float) -> np.ndarray:
    """Mean-conserving 5-point monthly interpolation weights
    (interpolation.f90:38-69) -> [12] weight vector."""
    c0 = 1.0 / 12.0
    t0 = c0 * tmonth
    t1 = c0 * (1.0 - tmonth)
    t2 = 0.25 * tmonth * (1.0 - tmonth)
    coeffs = {
        -2: -t1 + t2,
        -1: -c0 + 8 * t1 - 6 * t2,
        0: 7 * c0 + 10 * t2,
        1: -c0 + 8 * t0 - 6 * t2,
        2: -t0 + t2,
    }
    w = np.zeros(12)
    for off, c in coeffs.items():
        w[(imon - 1 + off) % 12] += c
    return w

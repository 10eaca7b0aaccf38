"""Timestamp conversions used across the ingest/analysis layers.

The conversions of /root/reference/python_src/merge_data_into_netCDF/
Sc_module.py:17-52 (datetime <-> unix seconds <-> 'seconds since 1970'
NetCDF convention <-> file-name date strings), UTC throughout.
"""

from __future__ import annotations

import datetime as dt

import numpy as np

_EPOCH = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)


def to_epoch_seconds(t) -> float:
    """datetime / datetime64 / ISO string / number -> unix seconds (UTC)."""
    if isinstance(t, (int, float, np.floating, np.integer)):
        return float(t)
    if isinstance(t, dt.datetime):
        if t.tzinfo is None:
            t = t.replace(tzinfo=dt.timezone.utc)
        return t.timestamp()
    return float(np.datetime64(t, "s").astype("f8"))


def from_epoch_seconds(seconds: float) -> dt.datetime:
    """Unix seconds -> aware UTC datetime."""
    return _EPOCH + dt.timedelta(seconds=float(seconds))


def to_datetime64(t) -> np.datetime64:
    return np.datetime64(int(round(to_epoch_seconds(t))), "s")


def parse_compact(stamp: str) -> dt.datetime:
    """'YYYYMMDDHHMM[SS]' or 'YYYYMMDD' file-name stamps -> UTC datetime
    (the formats of the reference's sonde/MWR file names,
    preprocessing4all.py:535-550)."""
    fmts = {8: "%Y%m%d", 12: "%Y%m%d%H%M", 14: "%Y%m%d%H%M%S"}
    fmt = fmts.get(len(stamp))
    if fmt is None:
        raise ValueError(f"unrecognized stamp {stamp!r}")
    return dt.datetime.strptime(stamp, fmt).replace(tzinfo=dt.timezone.utc)


def format_compact(t, seconds: bool = False) -> str:
    d = from_epoch_seconds(to_epoch_seconds(t))
    return d.strftime("%Y%m%d%H%M%S" if seconds else "%Y%m%d%H%M")

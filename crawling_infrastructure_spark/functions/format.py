"""F8 report formatting — byte-parity ports of the reference's helpers
(lib/misc/helpers.ts:96-128), used by its stats endpoints. Pure functions
plus Spark-column forms for report queries.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_SIZES = ["Bytes", "KB", "MB", "GB", "TB", "PB", "EB", "ZB", "YB"]


def format_bytes(n: float, decimals: int = 2) -> str:
    """helpers.ts:96-106 formatBytes. JS parseFloat(toFixed(dm)) drops
    trailing zeros — '1.5 KB', not '1.50 KB'."""
    if n == 0:
        return "0 Bytes"
    dm = 0 if decimals < 0 else decimals
    i = math.floor(math.log(n) / math.log(1024))
    v = n / (1024 ** i)
    # JS toFixed rounds half away from zero ((2.5).toFixed(0) == '3');
    # Python round() banker's-rounds (round(2.5) == 2) — explicit half-up
    s = f"{v:.{dm}f}".rstrip("0").rstrip(".") if dm else f"{math.floor(v + 0.5):d}"
    return f"{s} {_SIZES[i]}"


def time_format(ms: float) -> dict[str, int]:
    """helpers.ts:113-128 timeFormat: ms -> {day, hour, minute, seconds}."""
    seconds = math.floor(ms / 1000)
    minute, seconds = seconds // 60, seconds % 60
    hour, minute = minute // 60, minute % 60
    day, hour = hour // 24, hour % 24
    return {"day": day, "hour": hour, "minute": minute, "seconds": seconds}


def time_format_col(ms: Column) -> Column:
    """Spark-column timeFormat: struct(day, hour, minute, seconds)."""
    s = F.floor(ms / 1000)
    return F.struct(
        F.floor(s / 86400).cast("long").alias("day"),
        (F.floor(s / 3600) % 24).cast("long").alias("hour"),
        (F.floor(s / 60) % 60).cast("long").alias("minute"),
        (s % 60).cast("long").alias("seconds"),
    )

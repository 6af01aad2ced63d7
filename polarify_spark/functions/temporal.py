"""Timezone-proof temporal column expressions.

Spark renders TIMESTAMP through the session timezone and TIMESTAMP_NTZ
through none; DuckDB compares naive values. Converting between them with
casts silently routes through the session zone, so any oracle comparison
(or any job that must behave identically on differently-configured
clusters) needs conversions built from *field extraction*, which is
timezone-independent on ntz values.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import Column


def ntz_epoch_seconds(col: "Column | str") -> "Column":
    """Epoch seconds of a TIMESTAMP_NTZ treating its wall-clock value as
    UTC (DuckDB's ``epoch()`` on naive timestamps) — independent of
    ``spark.sql.session.timeZone``. Built from epoch-day arithmetic plus
    time-of-day field extraction; a bare ``unix_timestamp`` would interpret
    the value in the session zone instead."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return (
        F.unix_date(c.cast("date")).cast("long") * 86400
        + F.hour(c) * 3600
        + F.minute(c) * 60
        + F.second(c)
    )


def ntz_as_utc_instant(col: "Column | str") -> "Column":
    """The TIMESTAMP (instant) whose UTC rendering equals the ntz value's
    wall clock — i.e. interpret the naive value as UTC, regardless of the
    session timezone."""
    from pyspark.sql import functions as F

    return F.timestamp_seconds(ntz_epoch_seconds(col))

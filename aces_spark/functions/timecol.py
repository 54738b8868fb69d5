"""Timestamp-column normalization shared by every time consumer.

Parquet written by different producers surfaces event times as
``TIMESTAMP`` (LTZ), ``TIMESTAMP_NTZ`` (the ANSI local-datetime type that
Spark 4 reads from parquet isAdjustedToUTC=false), a string, or a raw
epoch. Functions like ``unix_micros`` accept only ``TIMESTAMP``, so every
operator that does epoch math MUST normalize first — through this one
helper, so batch (``datapipe.sessions``) and streaming
(``streaming.pipeline``) can never diverge in type handling.

The cast is semantics-preserving for all inputs we accept: NTZ→LTZ is
interpreted in the session timezone, which tests pin to UTC (the engine
convention — all event times are UTC wall-clock, matching the reference's
timezone-naive Polars datetimes, ``src/aces/predicates.py:211``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_timestamp(col: Column | str) -> Column:
    """Return ``col`` as a ``TIMESTAMP`` (LTZ) column.

    A no-op on TIMESTAMP inputs; converts TIMESTAMP_NTZ / DATE / ISO-8601
    strings. Catalyst folds the cast into the scan projection, so there is
    no runtime cost on already-typed columns.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since epoch of ``col`` regardless of which timestamp
    flavor the source produced (the safe spelling of ``unix_micros``)."""
    return F.unix_micros(as_timestamp(col))

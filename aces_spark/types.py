"""Window-bound descriptor types for the two aggregation kernels.

Semantics mirror the reference engine's bound objects
(``src/aces/types.py:25-143`` for temporal bounds and ``:146-325`` for
event bounds), re-expressed for a Spark execution target: instead of
Polars ``rolling`` kwargs we derive microsecond frame offsets for
``Window.rangeBetween`` and a ``(mode, closed)`` pair for the cumulative
sum kernel.
"""

from __future__ import annotations

import dataclasses
from datetime import timedelta

PRED_CNT_TYPE = "long"  # reference: PRED_CNT_TYPE = pl.Int64 (src/aces/types.py:15)

START_OF_RECORD_KEY = "_RECORD_START"  # src/aces/types.py:18
END_OF_RECORD_KEY = "_RECORD_END"  # src/aces/types.py:19
ANY_EVENT_COLUMN = "_ANY_EVENT"  # src/aces/types.py:22

MICROS = timedelta(microseconds=1)


def td_to_us(td: timedelta) -> int:
    """Exact microsecond count of a timedelta (timestamps are μs precision)."""
    return (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds


def closed_str(left_inclusive: bool, right_inclusive: bool) -> str:
    """Map two inclusivity flags to the 4-way closedness used throughout the
    reference (``src/aces/types.py:126-133``, ``:300-307``)."""
    if left_inclusive and right_inclusive:
        return "both"
    if left_inclusive:
        return "left"
    if right_inclusive:
        return "right"
    return "none"


@dataclasses.dataclass(order=True)
class TemporalWindowBounds:
    """A fixed-duration window relative to each row.

    Field order and meaning match the reference (``src/aces/types.py:25-73``):
    ``left_inclusive``, ``window_size``, ``right_inclusive``, ``offset``.
    Negative ``window_size`` means the window looks backward from
    ``row_ts + offset`` (normalization mirrors ``src/aces/types.py:135-141``).
    """

    left_inclusive: bool
    window_size: timedelta
    right_inclusive: bool
    offset: timedelta | None = None

    def __post_init__(self) -> None:
        if self.offset is None:
            self.offset = timedelta(0)

    def __iter__(self):
        return iter((self.left_inclusive, self.window_size, self.right_inclusive, self.offset))

    def __getitem__(self, key):
        return (self.left_inclusive, self.window_size, self.right_inclusive, self.offset)[key]

    @property
    def spark_range_bounds(self) -> tuple[int, int]:
        """Frame bounds (in μs, both-inclusive) for ``Window.rangeBetween``
        over ``unix_micros(timestamp)``.

        Spark range frames are closed on both ends, so open endpoints shrink
        the bound by exactly 1 μs — valid because all timestamps are μs
        precision (the reference uses the same ±1 μs trick for its boundary
        interleave, ``src/aces/aggregate.py:1013-1017``).
        """
        off_us = td_to_us(self.offset)
        ws_us = td_to_us(self.window_size)
        lo = off_us + min(ws_us, 0)
        hi = off_us + max(ws_us, 0)
        # For negative window sizes the reference flips the window direction
        # but keeps `closed` tied to (left, right) of the *covered interval*
        # (src/aces/types.py:126-143): left_inclusive always governs the
        # earlier endpoint, right_inclusive the later one.
        if not self.left_inclusive:
            lo += 1
        if not self.right_inclusive:
            hi -= 1
        return lo, hi


@dataclasses.dataclass(order=True)
class ToEventWindowBounds:
    """A window from each row to the nearest qualifying boundary event.

    Field order/meaning match the reference (``src/aces/types.py:146-247``).
    ``end_event`` names a predicate column (``>0`` marks a boundary row); a
    leading ``-`` flips direction (boundary precedes the row). The special
    keys ``_RECORD_START`` / ``_RECORD_END`` bound at the subject's first /
    last event (``src/aces/types.py:309-318``).
    """

    left_inclusive: bool
    end_event: str
    right_inclusive: bool
    offset: timedelta | None = None

    def __post_init__(self) -> None:
        if self.end_event == "":
            raise ValueError("The 'end_event' must be a non-empty string.")
        if self.end_event == START_OF_RECORD_KEY:
            raise ValueError(
                f"It doesn't make sense to have the start of the record {START_OF_RECORD_KEY} be an end "
                "event. Did you mean to make that be the start event (which should result in the "
                f"`end_event` parameter being '-{START_OF_RECORD_KEY}')?"
            )
        if self.end_event == f"-{END_OF_RECORD_KEY}":
            raise ValueError(
                f"It doesn't make sense to have the end of the record {END_OF_RECORD_KEY} be a start "
                "event. Did you mean to make that be the end event (which should result in the "
                f"`end_event` parameter being '{END_OF_RECORD_KEY}')?"
            )
        if self.offset is None:
            self.offset = timedelta(0)

    def __iter__(self):
        return iter((self.left_inclusive, self.end_event, self.right_inclusive, self.offset))

    def __getitem__(self, key):
        return (self.left_inclusive, self.end_event, self.right_inclusive, self.offset)[key]

    @property
    def bound_sum_kwargs(self) -> dict:
        """Translate to the cumsum-kernel's ``(boundary, mode, closed,
        offset)`` parameters (reference: ``src/aces/types.py:249-325``).

        ``boundary`` is returned as a descriptor ``("col", name)`` /
        ``("record_start",)`` / ``("record_end",)`` rather than an engine
        expression, so the kernel owns all Spark-specific construction.
        """
        closed = closed_str(self.left_inclusive, self.right_inclusive)
        mode = "bound_to_row" if self.end_event.startswith("-") else "row_to_bound"
        end_event = self.end_event[1:] if mode == "bound_to_row" else self.end_event

        if end_event == START_OF_RECORD_KEY:
            boundary = ("record_start",)
        elif end_event == END_OF_RECORD_KEY:
            boundary = ("record_end",)
        else:
            boundary = ("col", end_event)

        return {"boundary": boundary, "mode": mode, "closed": closed, "offset": self.offset}

"""Fast construction of large (nested) array literals.

``F.lit(nested_python_list)`` builds the Literal tree element by element
through py4j — one JVM round-trip per element — so a k×dim centroid
matrix or hyperplane table costs SECONDS of driver time before anything
runs (measured: 48×64 doubles ≈ 2.5 s, re-paid on every call site that
embeds the matrix). Rendering the same values as ONE SQL ``array(...)``
expression and parsing it JVM-side costs one round-trip (~7 ms for the
same matrix) and yields the identical Literal: Python ``repr`` prints
the shortest round-trip decimal form and ``Double.parseDouble`` is
correctly rounded, so every element is bit-identical to the ``F.lit``
path (verified element-wise at a call site before the switch).

Non-finite floats and empty arrays fall back to ``F.lit`` — SQL double
literals cannot spell NaN/Infinity inline and an empty ``array()``
would type as ``array<string>``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _render(v, int_type: str) -> str | None:
    """SQL literal text for ``v`` (nested lists of float/int), or None
    when the value needs the ``F.lit`` fallback."""
    if isinstance(v, (list, tuple)):
        if not v:
            return None
        parts = []
        for x in v:
            p = _render(x, int_type)
            if p is None:
                return None
            parts.append(p)
        return "array(" + ",".join(parts) + ")"
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return f"{v}{int_type}"
    f = float(v)
    if not math.isfinite(f):
        return None
    return repr(f) + "D"


def array_lit(data, int_type: str = "L") -> Column:
    """One-round-trip literal for a (possibly nested) list of numbers.

    Floats become DOUBLE literals (exact ``repr`` round-trip); ints
    become BIGINT (``int_type='L'``, the ``F.lit`` default for Python
    ints) — pass ``int_type=''`` for INT elements. Falls back to
    ``F.lit(data)`` verbatim for empty arrays or non-finite floats.
    """
    sql = _render(data, int_type)
    if sql is None:
        return F.lit(data)
    return F.expr(sql)

"""Shared portable-hash expressions.

One definition of the md5-derived 60-bit integer hash used by the
distinct sketches and weighted sampling (and mirrorable in any engine as
``CAST(concat('0x', substring(md5(CAST(x AS VARCHAR)), 1, 15)) AS
BIGINT)``), so a fix to the recipe lands everywhere at once.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_long60"]


def md5_long60(col: Column) -> Column:
    """60-bit positive integer from md5 of the value's string form —
    portable to any engine with md5 + hex parsing. NULL in → NULL out
    (callers decide whether nulls participate; both sketch modules
    filter them out first, matching COUNT(DISTINCT col) semantics)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )

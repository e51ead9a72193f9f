"""Null-safe predicate helpers.

The reference carries missing strings as ``''`` (pandas fillna) while the
engine holds real SQL nulls internally (SURVEY §4 trap 7).  These helpers
express the reference's ``''``-convention guards over nullable columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def blank(col: Column | str) -> Column:
    """True where the reference would see ``''`` (null or empty/whitespace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.trim(c) == "", F.lit(True))


def not_blank(col: Column | str) -> Column:
    return ~blank(col)


def s(col: Column | str) -> Column:
    """The reference's ``astype(str)``-view of a column: null → ''."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(""))


def contains_ci(col: Column | str, pattern: str) -> Column:
    """pandas ``str.contains(pattern, case=False, na=False)``: partial
    regex match, case-insensitive, null → False."""
    return F.coalesce(s(col).rlike(f"(?i){pattern}"), F.lit(False))


def contains_cs(col: Column | str, pattern: str) -> Column:
    """pandas ``str.contains(pattern, na=False)`` (case-sensitive;
    patterns may carry their own ``(?i)``)."""
    return F.coalesce(s(col).rlike(pattern), F.lit(False))

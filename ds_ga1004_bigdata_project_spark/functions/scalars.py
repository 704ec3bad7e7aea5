"""Scalar function library (SURVEY.md §2.8, F1-F8).

Every function here is a Catalyst expression (whole-stage-codegen'd, JVM-side).
The reference implemented these as pandas ``.apply`` row functions
(``Exploration-EDA.ipynb#cell96-104``); per SURVEY §2.13 all of them are
expressible as built-in exprs, so the engine ships **zero** Python UDFs on the
scalar path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_brackets(col: Column) -> Column:
    """F1 — the reference's ``clean_word``: ``string[2:-2]`` stripping "['…']"
    (``Exploration-EDA.ipynb#cell99``), generalized to a regex strip of leading
    ``['`` and trailing ``']``."""
    return F.regexp_replace(col, r"^\['|'\]$", "")


def contains_word(col: Column, word: str) -> Column:
    """F2 — case-insensitive substring containment
    (``Exploration-EDA.ipynb#cell89``)."""
    return F.lower(col).contains(word.lower())


def shift_index(col: Column, delta: int = -1) -> Column:
    """F3 — integer key arithmetic (the 1-based→0-based FK shift,
    ``Exploration-EDA.ipynb#cell34``)."""
    return col + F.lit(delta)


def na_sentinel(col: Column, sentinel: str = "NA") -> Column:
    """F4 — NaN/null → sentinel string (``Exploration-EDA.ipynb#cell99``'s
    ``if string != string: return 'NA'``) as ``coalesce``."""
    return F.coalesce(col, F.lit(sentinel))


def safe_ratio(num: Column, den: Column, scale: int = 4) -> Column:
    """F8 — guarded rounded ratio (den=0 → null, not error)."""
    return F.round(num / F.nullif(den, F.lit(0)), scale)

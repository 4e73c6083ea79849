"""String Column helpers mirroring the reference's URL/key functions.

Regex notes: the reference's Presto patterns use Java possessive
quantifiers (``'\\?.+=?+$'``, ``'#*+$'`` — reference
``dash_app/tasks.py:651``, ``1870``).  ``=?+`` and ``#*+`` can match empty,
so the *effective* semantics are "strip from the first ``?`` (with at
least one following char) to end" and, for the metadata variant, "strip
trailing ``#`` runs".  We implement those effective semantics with
portable (RE2-safe) patterns so oracle engines compute the identical
result; the deviation is syntactic only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_part(c: Column, delim: str, n: int) -> Column:
    """Presto/DuckDB ``split_part`` (1-indexed; empty string when out of
    range).  ``try_element_at`` because ANSI mode (Spark 4 default) makes
    plain ``element_at`` throw on out-of-range indexes."""
    import re

    got = F.try_element_at(F.split(c, re.escape(delim), -1), F.lit(n))
    return F.coalesce(got, F.lit(""))


def wiki_name_from_url(url: Column) -> Column:
    """Domain extraction: ``split_part(split_part(page_url,'://',2),'/',1)``
    (reference ``dash_app/tasks.py:1759``)."""
    return split_part(split_part(url, "://", 2), "/", 1)


def canonical_page_trending(url: Column) -> Column:
    """Strip query-string and fragment (reference ``dash_app/tasks.py:1870``:
    ``regexp_replace(regexp_replace(page_url,'\\?.+=?+$',''),'#.+$','')``)."""
    return F.regexp_replace(F.regexp_replace(url, r"\?.+$", ""), r"#.+$", "")


def canonical_page_metadata(url: Column) -> Column:
    """Metadata variant (reference ``dash_app/tasks.py:651``): strips the
    query-string; its second pattern (``'#*+$'``) only removes trailing
    ``#`` runs — fragments are kept.  Faithfully mirrored."""
    return F.regexp_replace(F.regexp_replace(url, r"\?.+$", ""), r"#+$", "")


def stringify(c: Column) -> Column:
    """Display normalizer (reference F1 ``stringify``,
    ``dash_app/dash_app.py:754-765``): NULL-safe cast to string with true
    NULLs preserved — never the pandas ``'nan'``-string artifact the
    reference fights (SURVEY.md §7.4.4)."""
    return c.cast("string")


def quoted_in_list(values: list[str]) -> str:
    """``'v1','v2',...`` IN-list building (reference ``col_to_string``,
    ``biutils.py:221-228``) for the SQL-string entry point.  Prefer a
    broadcast semi-join on a DataFrame — this exists for parity with
    callers that need literal SQL."""
    escaped = [str(v).replace("'", "''") for v in values]
    return ", ".join(f"'{v}'" for v in escaped)


def auto_num_format(c: Column, precision: int = 1) -> Column:
    """Human-readable K/M/B/T formatting (reference ``biutils.py:230-237``).
    Display-layer helper; returns a string Column."""
    n = c.cast("double")
    def fmt(div: float, suffix: str) -> Column:
        return F.concat(
            F.format_number(n / F.lit(div), precision), F.lit(suffix)
        )
    return (
        F.when(F.abs(n) >= 1e12, fmt(1e12, "T"))
        .when(F.abs(n) >= 1e9, fmt(1e9, "B"))
        .when(F.abs(n) >= 1e6, fmt(1e6, "M"))
        .when(F.abs(n) >= 1e3, fmt(1e3, "K"))
        .otherwise(F.format_number(n, precision))
    )

"""Regex document operations — the Pattern Editor tool, Spark-first.

Reference (app/(contents)/pattern-editor/page.tsx): a single in-memory
string with count / replace-all / replace-first over a user pattern
(flags: literal, case-insensitive, multiline — :59-74,242-278) plus a
library of 11 preset transforms (:28-40). Here a "document" is a row of
a DataFrame text column, so every op is a column expression applied to
millions of documents at once.

- count / replace-all / char-count: built-in ``regexp_count`` /
  ``regexp_replace`` — JVM-side, whole-stage codegen.
- replace-first has no Spark builtin -> regexp_instr/regexp_substr
  splice (JVM-side) for plain replacements; Arrow-batched pandas UDF
  with ``re.sub(count=1)`` only when the replacement uses group
  references (the documented slow path, F14).
- literal mode escapes the pattern at plan-build time (F16).

Patterns in :data:`PRESETS` use explicit character classes (no bare
``\\s``) so Java regex (Spark), RE2 (DuckDB oracle), and Python ``re``
agree.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# flags / pattern prep
# ---------------------------------------------------------------------------


def build_pattern(
    pattern: str,
    literal: bool = False,
    case_insensitive: bool = False,
    multiline: bool = False,
) -> str:
    """User pattern + flags -> one inline-flagged regex string
    (pattern-editor/page.tsx:59-74). Literal escapes regex
    metacharacters at plan time; inline ``(?i)``/``(?m)`` work in Java
    regex, RE2 and Python alike."""
    pat = re.escape(pattern) if literal else pattern
    flags = ("(?i)" if case_insensitive else "") + ("(?m)" if multiline else "")
    return flags + pat


# ---------------------------------------------------------------------------
# core ops (F12-F14, A2-A3)
# ---------------------------------------------------------------------------


def count_matches_col(col: str | Column, pattern: str, **flags) -> Column:
    """Per-document match count (countMatches, pattern-editor:77-91)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(build_pattern(pattern, **flags)))


def count_matches(df: DataFrame, col: str, pattern: str, **flags) -> DataFrame:
    """Corpus-wide total match count — one partial+final agg."""
    return df.agg(
        F.sum(count_matches_col(col, pattern, **flags)).alias("match_count")
    )


def char_count(df: DataFrame, col: str) -> DataFrame:
    """Total character count (pattern-editor:325)."""
    return df.agg(F.sum(F.length(F.col(col))).alias("char_count"))


def replace_all_col(col: str | Column, pattern: str, replacement: str, **flags) -> Column:
    """Replace every match (onReplaceAll, pattern-editor:261-278)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, build_pattern(pattern, **flags), replacement)


def replace_first_col(col: str | Column, pattern: str, replacement: str, **flags) -> Column:
    """Replace only the first match (onReplaceOne, pattern-editor:242-259).

    No replace-first builtin, but for a plain (backreference-free)
    replacement it compiles to JVM expressions: locate the first match
    with ``regexp_instr``, grab its text with ``regexp_substr``, splice
    around it — whole-stage codegen, no Python worker. A zero-length
    match inserts at the match position, exactly like ``re.sub(count=1)``.
    Replacements using ``$n``/``\\n`` group references fall back to the
    Arrow-batched pandas UDF (the documented slow path, F14).
    """
    pat = build_pattern(pattern, **flags)
    c = F.col(col) if isinstance(col, str) else col

    if "$" not in replacement and "\\" not in replacement:
        pos = F.regexp_instr(c, F.lit(pat))  # 1-based, 0 = no match
        # regexp_substr returns NULL for a zero-length match — coalesce
        # the match length to 0 so the splice inserts at the position
        # (re.sub(count=1) semantics) instead of nulling the row
        m_len = F.coalesce(F.length(F.regexp_substr(c, F.lit(pat))), F.lit(0))
        spliced = F.concat(
            F.substring(c, F.lit(1), pos - F.lit(1)),
            F.lit(replacement),
            F.substring(c, pos + m_len, F.length(c)),
        )
        return F.when(pos > 0, spliced).otherwise(c)

    compiled = re.compile(pat)

    @pandas_udf("string")
    def _replace_first(s: pd.Series) -> pd.Series:
        return s.str.replace(compiled, replacement, n=1, regex=True)

    return _replace_first(c)


# ---------------------------------------------------------------------------
# preset transform library (F15, pattern-editor:28-40)
# ---------------------------------------------------------------------------

# name -> list of (pattern, replacement) applied in order. Data, not code.
PRESETS: dict[str, list[tuple[str, str]]] = {
    # join all lines into one (strip newlines)
    "strip_newlines": [(r"(\r\n|\r|\n)+", " ")],
    # collapse runs of blank lines into a single newline
    "collapse_blank_lines": [(r"(\r?\n)[ \t]*(\r?\n)+", "\n")],
    # sentence end -> newline
    "sentence_to_newline": [(r"([.!?])[ \t]+", "$1\n")],
    # comma -> newline
    "comma_to_newline": [(r",[ \t]*", "\n")],
    # trim leading/trailing whitespace per line
    "trim_lines": [(r"(?m)^[ \t]+", ""), (r"(?m)[ \t]+$", "")],
    # collapse multiple spaces into one
    "collapse_spaces": [(r"[ ]{2,}", " ")],
    # tabs -> spaces
    "tabs_to_spaces": [(r"\t", "    ")],
    # 4 spaces -> tab
    "spaces_to_tabs": [(r"[ ]{4}", "\t")],
    # remove non-breaking spaces
    "remove_nbsp": [(" ", " ")],
    # remove zero-width characters
    "remove_zero_width": [("[​‌‍﻿]", "")],
    # normalize comma spacing: "a ,b" / "a,b" -> "a, b"
    "comma_spacing": [(r"[ \t]*,[ \t]*", ", ")],
}


def apply_preset_col(col: str | Column, preset: str) -> Column:
    """Compose a preset's replace chain into one Column expression."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in PRESETS[preset]:
        c = F.regexp_replace(c, pat, repl)
    return c


def apply_presets(df: DataFrame, col: str, presets: list[str]) -> DataFrame:
    """Apply presets in order to ``col`` — still a single projection."""
    c: Column = F.col(col)
    for p in presets:
        for pat, repl in PRESETS[p]:
            c = F.regexp_replace(c, pat, repl)
    return df.withColumn(col, c)

"""Pattern-editor ops: counts, replaces, flags, presets (SURVEY §5 B4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data__converter_spark import pattern


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "Hello  world.  This is fine!  Next sentence?  End"),
        (2, "a,b ,c  ,  d"),
        (3, "line1\n\n\n\nline2\r\n\r\nline3"),
        (4, "  padded line  \n\ttabbed\tcell\n"),
        (5, "nb sp and zero​width‌ chars﻿"),
        (6, "a.c appears: a.c and abc and axc"),
        (7, "The theme of THE day: the end"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def one(df, doc_id, col="out"):
    return df.filter(F.col("doc_id") == doc_id).collect()[0][col]


def test_count_literal_vs_regex(spark, messy):
    # regex mode: '.' matches any char; literal mode only the exact text
    regex_n = messy.select(
        "doc_id", pattern.count_matches_col("text", "a.c").alias("n")
    )
    lit_n = messy.select(
        "doc_id", pattern.count_matches_col("text", "a.c", literal=True).alias("n")
    )
    assert one(regex_n, 6, "n") == 4  # a.c, a.c, abc, axc
    assert one(lit_n, 6, "n") == 2


def test_case_insensitive_count(spark, messy):
    n_cs = messy.select("doc_id", pattern.count_matches_col("text", "the").alias("n"))
    n_ci = messy.select(
        "doc_id", pattern.count_matches_col("text", "the", case_insensitive=True).alias("n")
    )
    assert one(n_cs, 7, "n") == 2  # 'theme', 'the end'
    assert one(n_ci, 7, "n") == 4


def test_corpus_count_and_char_count(spark, messy):
    total = pattern.count_matches(messy, "text", "line").collect()[0]["match_count"]
    assert total == 4  # line1/line2/line3 + 'padded line'
    chars = pattern.char_count(messy, "text").collect()[0]["char_count"]
    assert chars == sum(len(r["text"]) for r in messy.collect())


def test_replace_first_zero_length_match(spark):
    # A zero-length first match must insert at the position (re.sub
    # count=1 semantics), never null the row (regexp_substr returns
    # NULL for empty matches — regression for the splice path).
    df = spark.createDataFrame([("abc",), ("zabc",)], ["text"])
    out = {
        r.text: r.t
        for r in df.select(
            "text", pattern.replace_first_col("text", "z*", "X").alias("t")
        ).collect()
    }
    assert out["abc"] == "Xabc"   # empty match at position 1
    assert out["zabc"] == "Xabc"  # real match consumed


def test_char_count_length_semantics_cross_engine(spark):
    # Pin the A3 char_count definition across engines: Spark length()
    # counts Unicode code points (UTF8String.numChars), and so does
    # DuckDB's length() — including CJK, astral-plane emoji (surrogate
    # pairs in UTF-16), and ZWJ sequences. Python len() counts the same.
    import duckdb

    texts = [
        "中文字符串测试",          # CJK, 7 code points
        "café",              # combining-free accent, 4
        "\U0001F600\U0001F680",   # astral emoji, 2
        "\U0001F469‍\U0001F4BB",  # ZWJ sequence: 3 code points
        "mixed 中文 and \U0001F600",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {
        r["text"]: r["n"]
        for r in df.select("text", F.length("text").alias("n")).collect()
    }
    duck = dict(
        duckdb.sql(
            "SELECT t, length(t) FROM (SELECT unnest(?) AS t)", params=[texts]
        ).fetchall()
    )
    for t in texts:
        assert got[t] == len(t) == duck[t], (t, got[t], len(t), duck.get(t))


def test_replace_first_vs_all(spark, messy):
    all_out = messy.select(
        "doc_id", pattern.replace_all_col("text", "the", "X").alias("out")
    )
    first_out = messy.select(
        "doc_id", pattern.replace_first_col("text", "the", "X").alias("out")
    )
    assert one(all_out, 7) == "The Xme of THE day: X end"
    assert one(first_out, 7) == "The Xme of THE day: the end"


def test_multiline_flag(spark, messy):
    # ^ anchors per line only with multiline
    n = messy.select(
        "doc_id",
        pattern.count_matches_col("text", "^line", multiline=True).alias("n"),
    )
    assert one(n, 3, "n") == 3


def test_presets(spark, messy):
    def run(preset, doc_id):
        return one(
            messy.select("doc_id", pattern.apply_preset_col("text", preset).alias("out")),
            doc_id,
        )

    assert run("strip_newlines", 3) == "line1 line2 line3"
    assert run("collapse_blank_lines", 3) == "line1\nline2\nline3"
    assert run("collapse_spaces", 1) == "Hello world. This is fine! Next sentence? End"
    assert run("comma_spacing", 2) == "a, b, c, d"
    assert run("comma_to_newline", 2) == "a\nb \nc  \nd"
    assert run("remove_nbsp", 5) == "nb sp and zero​width‌ chars﻿"
    assert run("remove_zero_width", 5) == "nb sp and zerowidth chars"
    assert run("trim_lines", 4) == "padded line\ntabbed\tcell\n"
    assert (
        run("sentence_to_newline", 1)
        == "Hello  world.\nThis is fine!\nNext sentence?\nEnd"
    )


def test_apply_presets_chain_single_projection(spark, messy):
    out = pattern.apply_presets(messy, "text", ["strip_newlines", "collapse_spaces"])
    assert one(out.withColumnRenamed("text", "out"), 3) == "line1 line2 line3"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan

"""Metamorphic/property tests for the masking compiler (SURVEY §5.3)."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from data__converter_spark.mask import (
    DIGITS,
    EMAIL_DOMAINS,
    FieldRule,
    LOWER,
    compile_rule,
    mask_table,
)


@pytest.fixture(scope="module")
def pii(spark):
    rows = [
        (1, "Alice Smith", "alice@corp.example", "010-1111-2222", "1990-05-17", "AB12", 523, "hello"),
        (2, "Bob Jones", "bob.j@mail.example", "010-3333-4444", "1985-11-02", "ZZ99", 9000, "note, with comma"),
        (3, None, None, None, None, None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "id long, name string, email string, phone string, birth_date string, "
        "code string, score long, note string",
    )


def col_vals(df, c):
    return [r[c] for r in df.select(c).collect()]


def test_sha256_exact(spark, pii):
    out = {
        r["id"]: r["h"]
        for r in pii.select(
            "id", compile_rule("id", FieldRule("hashSHA256")).alias("h")
        ).collect()
    }
    assert out[1] == hashlib.sha256(b"1").hexdigest()
    # null source stringifies to '' first (row 3's name is null)
    out_name = {
        r["id"]: r["h"]
        for r in pii.select(
            "id", compile_rule("name", FieldRule("hashSHA256")).alias("h")
        ).collect()
    }
    assert out_name[3] == hashlib.sha256(b"").hexdigest()


def test_blank_and_none(spark, pii):
    df = pii.select(
        compile_rule("note", FieldRule("blank")).alias("b"),
        compile_rule("name", FieldRule("none")).alias("n"),
    )
    rows = df.collect()
    assert all(r["b"] == "" for r in rows)
    assert rows[0]["n"] == "Alice Smith"
    assert rows[2]["n"] == ""  # null -> '' stringify


def test_random_string_invariants(spark, pii):
    rule = FieldRule("randomString", fixed_part="AB", str_len=8, fill_kind="digits")
    vals = col_vals(pii.select(compile_rule("code", rule, seed=7).alias("code")), "code")
    for v in vals:
        assert v.startswith("AB") and len(v) == 8
        assert all(ch in DIGITS for ch in v[2:])
    # deterministic given the seed
    vals2 = col_vals(pii.select(compile_rule("code", rule, seed=7).alias("code")), "code")
    assert vals == vals2
    # different seed, different fill (overwhelmingly)
    vals3 = col_vals(pii.select(compile_rule("code", rule, seed=8).alias("code")), "code")
    assert vals != vals3


def test_random_int_range(spark, pii):
    rule = FieldRule("randomInt", int_min=10, int_max=20)
    vals = col_vals(pii.select(compile_rule("score", rule).alias("s")), "s")
    assert all(10 <= int(v) <= 20 for v in vals)


def test_random_int_digit_mode_defaults_to_source_len(spark, pii):
    rule = FieldRule("randomInt")
    df = pii.filter("score is not null")
    vals = col_vals(df.select(compile_rule("score", rule).alias("s")), "s")
    srcs = col_vals(df, "score")
    for v, s in zip(vals, srcs):
        assert len(v) == len(str(s)) and v.isdigit()


def test_random_date_year_and_range(spark, pii):
    in_year = col_vals(
        pii.select(compile_rule("birth_date", FieldRule("randomDate", fixed_part="1990")).alias("d")),
        "d",
    )
    assert all(v.startswith("1990-") for v in in_year)
    in_month = col_vals(
        pii.select(compile_rule("birth_date", FieldRule("randomDate", fixed_part="2024-02")).alias("d")),
        "d",
    )
    assert all(v.startswith("2024-02-") and 1 <= int(v[8:]) <= 29 for v in in_month)
    default_range = col_vals(
        pii.select(compile_rule("birth_date", FieldRule("randomDate")).alias("d")), "d"
    )
    assert all("2000-01-01" <= v <= "2030-12-31" for v in default_range)


def test_fake_name_email_phone_shapes(spark, pii):
    names = col_vals(pii.select(compile_rule("name", FieldRule("fakeName")).alias("v")), "v")
    assert all(re.fullmatch(r"[A-Z][a-z]+ [A-Z][a-z]+", v) for v in names)

    emails = col_vals(
        pii.select(compile_rule("email", FieldRule("fakeEmail", str_len=12)).alias("v")), "v"
    )
    for v in emails:
        local, domain = v.split("@")
        assert len(local) == 12 and all(c in LOWER for c in local)
        assert domain in EMAIL_DOMAINS

    phones = col_vals(
        pii.select(compile_rule("phone", FieldRule("fakePhone", fixed_part="12")).alias("v")), "v"
    )
    assert all(re.fullmatch(r"010-12\d{2}-\d{4}", v) for v in phones)


def test_mask_table_recovery_roundtrip(spark, pii):
    rules = {
        "name": FieldRule("fakeName"),
        "email": FieldRule("fakeEmail"),
        "score": FieldRule("randomInt", int_min=0, int_max=9999),
        "note": FieldRule("blank"),
    }
    masked, key = mask_table(pii, rules, seed=42, id_cols=["id"])
    assert set(key.columns) == {"ANON_ROW_ID", "name", "email", "score", "note"}
    # join back recovers originals
    rec = masked.select("ANON_ROW_ID", "id").join(key, "ANON_ROW_ID")
    got = {r["id"]: (r["name"], r["score"]) for r in rec.collect()}
    orig = {r["id"]: (r["name"], str(r["score"]) if r["score"] is not None else None)
            for r in pii.collect()}
    assert got == orig
    # unmasked columns pass through untouched
    ids_masked = sorted(r["id"] for r in masked.collect())
    assert ids_masked == [1, 2, 3]


def test_mask_table_shuffle_is_permutation(spark, pii):
    rules = {"note": FieldRule("blank")}
    m_plain, _ = mask_table(pii, rules, seed=1, shuffle=False, id_cols=["id"])
    m_shuf, _ = mask_table(pii, rules, seed=1, shuffle=True, id_cols=["id"])
    assert sorted(r["id"] for r in m_shuf.collect()) == sorted(
        r["id"] for r in m_plain.collect()
    )


def test_mask_is_single_projection(spark, pii):
    """The masked plan must stay a narrow Project over the scan — no
    shuffle, no UDF (the whole point of the compiler)."""
    rules = {"name": FieldRule("fakeName"), "email": FieldRule("fakeEmail")}
    masked, _ = mask_table(pii, rules, seed=42, id_cols=["id"])
    plan = masked._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_k_anonymity_classes_and_l_diversity(spark):
    from data__converter_spark.mask import k_anonymity

    rows = [
        # class (a, 1): 3 rows, sensitive {10, 10, 20} -> l=2
        ("a", 1, 10), ("a", 1, 10), ("a", 1, 20),
        # class (a, 2): 2 rows, same sensitive -> l=1, at risk for k=3
        ("a", 2, 5), ("a", 2, 5),
        # class (b, 1): exactly k rows -> NOT at risk (strict <)
        ("b", 1, 1), ("b", 1, 2), ("b", 1, 3),
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 long, s long")
    got = {
        (r["q1"], r["q2"], r["class_size"], r["l_distinct"], r["at_risk"])
        for r in k_anonymity(df, ["q1", "q2"], k=3, sensitive="s").collect()
    }
    assert got == {
        ("a", 1, 3, 2, False),
        ("a", 2, 2, 1, True),
        ("b", 1, 3, 3, False),
    }


def test_k_anonymity_without_sensitive_column(spark):
    from data__converter_spark.mask import k_anonymity

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "q string")
    out = k_anonymity(df, ["q"], k=2)
    assert "l_distinct" not in out.columns
    got = {(r["q"], r["class_size"], r["at_risk"]) for r in out.collect()}
    assert got == {("a", 2, False), ("b", 1, True)}

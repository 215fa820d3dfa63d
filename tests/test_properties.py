"""Property-based tests (hypothesis) for parser/writer/diff invariants.

Spark actions per example are expensive, so Spark-backed properties
cap max_examples low; pure-Python parsers get the full default budget.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data__converter_spark import compare
from data__converter_spark.io import pdf, readers, writers, xlsx_lite

# ---------------------------------------------------------------------------
# F21 page-spec parser — pure python, full example budget
# ---------------------------------------------------------------------------

page_chunk = st.one_of(
    st.integers(1, 99).map(str),
    st.tuples(st.integers(1, 99), st.integers(1, 99)).map(lambda t: f"{t[0]}-{t[1]}"),
    st.sampled_from(["x", "", " ", "a-b", "-", "3-"]),
)


@given(st.lists(page_chunk, max_size=8).map(",".join))
def test_parse_pages_invariants(spec):
    groups = pdf.parse_pages(spec)
    for g in groups:
        assert g, "no empty groups"
        assert g == sorted(g), "ranges normalized ascending"
        assert all(p >= 1 for p in g)
    # idempotence through the canonical rendering
    rendered = ",".join(
        f"{g[0]}-{g[-1]}" if len(g) > 1 else str(g[0]) for g in groups
    )
    assert pdf.parse_pages(rendered) == groups


# ---------------------------------------------------------------------------
# Column-letter round trip (xlsx_lite)
# ---------------------------------------------------------------------------


@given(st.integers(0, 2000))
def test_col_letter_roundtrip(i):
    assert xlsx_lite._col_index(f"{xlsx_lite._col_letter(i)}1") == i


# ---------------------------------------------------------------------------
# Spark-backed properties — few, small examples
# ---------------------------------------------------------------------------

cell = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00\r", exclude_categories=("Cs",)
    ),
    max_size=12,
)
table_rows = st.lists(
    st.tuples(st.integers(0, 50), cell, cell), min_size=1, max_size=6, unique_by=lambda t: t[0]
)

SPARK_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@settings(**SPARK_SETTINGS)
@given(table_rows)
def test_diff_self_is_all_same(spark, rows):
    df = spark.createDataFrame(rows, "k long, x string, y string")
    d = compare.diff(df, df, "k")
    statuses = {r["status"] for r in d.collect()}
    assert statuses <= {"same"}
    assert d.count() == len(rows)


@settings(**SPARK_SETTINGS)
@given(table_rows)
def test_diff_against_empty_is_all_deleted(spark, rows):
    df = spark.createDataFrame(rows, "k long, x string, y string")
    empty = df.limit(0)
    d = compare.diff(df, empty, "k")
    assert {r["status"] for r in d.collect()} == {"deleted"}


@settings(**SPARK_SETTINGS)
@given(st.lists(st.tuples(cell, cell), min_size=1, max_size=5))
def test_csv_roundtrip_arbitrary_cells(spark, tmp_path_factory, rows):
    # embedded commas, quotes, newlines must survive write -> read
    df = spark.createDataFrame(
        [(str(i), a, b) for i, (a, b) in enumerate(rows)], ["id", "a", "b"]
    )
    out = str(tmp_path_factory.mktemp("csvrt") / "t")
    writers.write_csv(df, out)
    back = readers.read_csv(spark, out, multiline=True)
    # reader trims cells (P7) with Java-trim semantics: all control
    # chars <= 0x20 count as whitespace, unlike Python's str.strip
    jtrim = "".join(chr(c) for c in range(0x21))
    want = {str(i): (a.strip(jtrim), b.strip(jtrim)) for i, (a, b) in enumerate(rows)}
    got = {
        r.id: ((r.a or "").strip(jtrim), (r.b or "").strip(jtrim))
        for r in back.collect()
    }
    # null round-trips as empty string at the edge (SURVEY §1.4)
    assert got == {k: (a, b) for k, (a, b) in want.items()}


@settings(**SPARK_SETTINGS)
@given(st.lists(st.tuples(cell, cell), min_size=1, max_size=5))
def test_xlsx_roundtrip_arbitrary_cells(spark, tmp_path_factory, rows):
    df = spark.createDataFrame(
        [(str(i), a, b) for i, (a, b) in enumerate(rows)], ["id", "a", "b"]
    )
    out = str(tmp_path_factory.mktemp("xlrt") / "wb.xlsx")
    writers.write_excel({"s": df}, out)
    back = readers.read_excel(spark, out)["s"]
    got = {r.id: (r.a, r.b) for r in back.collect()}
    assert got == {str(i): (a, b) for i, (a, b) in enumerate(rows)}
"""Convert I/O matrix tests (SURVEY §2.1/§2.2, §5.2 golden-file, §5.5
round-trip)."""

from __future__ import annotations

import os
import zipfile

import pytest

from data__converter_spark.io import convert, readers, writers


def _write(tmp_path, name: str, text: str, encoding: str = "utf-8") -> str:
    p = tmp_path / name
    p.write_bytes(text.encode(encoding))
    return str(p)


# ---------------------------------------------------------------------------
# CSV / TSV / delimiter sniffing
# ---------------------------------------------------------------------------


def test_csv_quoted_fields_and_trim(spark, tmp_path):
    path = _write(
        tmp_path,
        "a.csv",
        'id, name ,note\n1, alice ,"x, y"\n2,bob,"say ""hi"""\n',
    )
    df = readers.read_csv(spark, path)
    rows = {r.id: r for r in df.collect()}
    assert df.columns == ["id", "name", "note"]
    assert rows["1"].name == "alice"          # cells trimmed (P7)
    assert rows["1"].note == "x, y"           # quoted comma survives
    assert rows["2"].note == 'say "hi"'       # "" escape

def test_delimiter_sniffing(spark, tmp_path):
    semi = _write(tmp_path, "s.txt", "a;b;c\n1;2;3\n4;5;6\n")
    tab = _write(tmp_path, "t.txt", "a\tb\n1\t2\n")
    assert readers.detect_delimiter(spark, semi) == ";"
    assert readers.detect_delimiter(spark, tab) == "\t"
    df = readers.read_table_auto(spark, semi)
    assert df.columns == ["a", "b", "c"] and df.count() == 2


def test_tsv_forced_tab(spark, tmp_path):
    path = _write(tmp_path, "x.tsv", "k\tv\n1\ta,b\n")
    df = readers.read_table_auto(spark, path)
    assert df.collect()[0].v == "a,b"


def test_csv_roundtrip(spark, tmp_path, orders):
    sample = orders.select("o_orderkey", "o_orderstatus", "o_orderpriority").limit(200)
    out = str(tmp_path / "orders_csv")
    writers.write_csv(sample, out)
    back = readers.read_csv(spark, out)
    assert back.count() == 200
    a = {r.o_orderkey: r.o_orderpriority for r in sample.collect()}
    b = {r.o_orderkey: r.o_orderpriority for r in back.collect()}
    assert {str(k): v for k, v in a.items()} == b


# ---------------------------------------------------------------------------
# TXT lines
# ---------------------------------------------------------------------------


def test_txt_lines_blank_dropped(spark, tmp_path):
    path = _write(tmp_path, "l.txt", "alpha\n\n   \nbeta\n")
    df = readers.read_txt_lines(spark, path)
    assert [r.value for r in df.collect()] == ["alpha", "beta"]


def test_txt_writer_value_mode_roundtrip(spark, tmp_path):
    src = _write(tmp_path, "in.txt", "one\ntwo\nthree\n")
    df = readers.read_txt_lines(spark, src)
    out = str(tmp_path / "out_txt")
    writers.write_txt(df, out)
    back = readers.read_txt_lines(spark, out)
    assert sorted(r.value for r in back.collect()) == ["one", "three", "two"]


def test_txt_writer_json_lines_mode(spark, tmp_path, orders):
    df = orders.select("o_orderkey", "o_orderstatus").limit(5)
    out = str(tmp_path / "out_jsonl")
    writers.write_txt(df, out)
    back = readers.read_jsonl(spark, out)
    assert back.count() == 5 and set(back.columns) == {"o_orderkey", "o_orderstatus"}


# ---------------------------------------------------------------------------
# JSON shapes (S6)
# ---------------------------------------------------------------------------


def test_json_array_of_objects(spark, tmp_path):
    path = _write(tmp_path, "a.json", '[{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]')
    df = readers.read_json(spark, path)
    assert df.count() == 2 and set(df.columns) == {"x", "y"}


def test_json_array_under_key(spark, tmp_path):
    path = _write(
        tmp_path, "k.json", '{"meta": "m", "items": [{"x": 1}, {"x": 2}, {"x": 3}]}'
    )
    df = readers.read_json(spark, path)
    assert df.count() == 3 and "x" in df.columns


def test_json_scalar_array_wraps_value(spark, tmp_path):
    path = _write(tmp_path, "s.json", "[1, 2, 3]")
    df = readers.read_json(spark, path)
    assert df.columns == ["value"] and df.count() == 3


# ---------------------------------------------------------------------------
# XML (S8/S9/S10, K4)
# ---------------------------------------------------------------------------

XML_DOC = """<catalog>
  <meta>v1</meta>
  <item sku="a1"><name>Widget</name><price>10</price><dims><w>2</w><h>3</h></dims></item>
  <item sku="b2"><name>Gadget &amp; Co</name><price>20</price><dims><w>4</w><h>5</h></dims></item>
</catalog>
"""


def test_xml_read_rowtag_attrs_and_dotted(spark, tmp_path):
    path = _write(tmp_path, "c.xml", XML_DOC)
    df = readers.read_xml(spark, path, row_tag="item")
    rows = {r["@sku"]: r.asDict() for r in df.collect()}
    assert set(rows) == {"a1", "b2"}
    assert rows["a1"]["name"] == "Widget"
    assert rows["a1"]["dims.w"] == "2"          # dotted nested path (S10)
    assert rows["b2"]["name"] == "Gadget & Co"  # entity decoded


def test_xml_autodetect_tables(spark, tmp_path):
    path = _write(tmp_path, "c.xml", XML_DOC)
    tables = readers.read_xml_tables(spark, path)
    assert any(k.endswith("item") for k in tables)
    (name,) = [k for k in tables if k.endswith("item")]
    assert tables[name].count() == 2


AVRO_SCHEMA = {
    "type": "record",
    "name": "ev",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": ["null", "double"]},
        {"name": "ok", "type": "boolean"},
    ],
}

AVRO_ROWS = [
    {"id": 1, "name": "a", "score": 1.5, "ok": True},
    {"id": 2, "name": "유니코드", "score": None, "ok": False},
    {"id": 3, "name": "", "score": -0.25, "ok": True},
]


def test_avro_positive_path_stdlib_fallback(spark, tmp_path):
    # spark-avro is absent here, so read_avro must fall through to the
    # stdlib avro_lite OCF codec and produce real rows — per codec.
    from data__converter_spark.io import avro_lite

    for codec in ("null", "deflate"):
        d = tmp_path / codec
        d.mkdir()
        avro_lite.write_avro(str(d / "part1.avro"), AVRO_ROWS[:2], AVRO_SCHEMA, codec)
        avro_lite.write_avro(str(d / "part2.avro"), AVRO_ROWS[2:], AVRO_SCHEMA, codec)
        df = readers.read_avro(spark, str(d))
        assert [f.name for f in df.schema.fields] == ["id", "name", "score", "ok"]
        got = sorted(
            (r["id"], r["name"], r["score"], r["ok"]) for r in df.collect()
        )
        assert got == [(1, "a", 1.5, True), (2, "유니코드", None, False),
                       (3, "", -0.25, True)]


def test_avro_gate_on_unsupported_schema(spark, tmp_path):
    # a schema beyond the avro_lite subset (array field) must raise the
    # explicit spark-avro gate, not decode garbage
    import io as _io
    import json as _json

    from data__converter_spark.io import avro_lite

    buf = _io.BytesIO()
    buf.write(avro_lite.MAGIC)
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "xs", "type": {"type": "array", "items": "long"}}]}
    meta = {"avro.schema": _json.dumps(schema).encode(), "avro.codec": b"null"}
    avro_lite._write_long(buf, len(meta))
    for k, v in meta.items():
        avro_lite._write_bytes(buf, k.encode())
        avro_lite._write_bytes(buf, v)
    avro_lite._write_long(buf, 0)
    buf.write(b"0123456789abcdef")
    (tmp_path / "bad.avro").write_bytes(buf.getvalue())
    with pytest.raises(NotImplementedError, match="spark-avro"):
        readers.read_avro(spark, str(tmp_path / "bad.avro"))


def test_avro_header_truncation_is_distinct_and_peek_escalates(spark, tmp_path):
    # an OCF whose metadata map exceeds the 256 KB first peek must not
    # be misdiagnosed as an unsupported schema: read_avro_schema raises
    # the distinct AvroHeaderTruncated on the short prefix, and
    # read_avro escalates to the 8 MiB peek and succeeds
    from data__converter_spark.io import avro_lite

    d = tmp_path / "bigheader"
    d.mkdir()
    big_meta = {"junk.padding": b"x" * 400_000}
    avro_lite.write_avro(
        str(d / "big.avro"), AVRO_ROWS, AVRO_SCHEMA, "null", meta=big_meta
    )
    raw = (d / "big.avro").read_bytes()
    with pytest.raises(avro_lite.AvroHeaderTruncated):
        avro_lite.read_avro_schema(raw[:262_144])
    df = readers.read_avro(spark, str(d))
    assert df.count() == len(AVRO_ROWS)


def test_avro_multi_file_type_divergence_guard(spark, tmp_path):
    # same field NAMES, different field TYPES across a directory: the
    # kernel guard must fail loudly naming both signatures, not let a
    # silent long->double widening or Arrow coercion error through
    from data__converter_spark.io import avro_lite

    d = tmp_path / "retyped"
    d.mkdir()
    avro_lite.write_avro(str(d / "a.avro"), AVRO_ROWS, AVRO_SCHEMA, "null")
    schema2 = {
        "type": "record",
        "name": "ev",
        "fields": [
            {"name": "id", "type": "double"},  # was long
            {"name": "name", "type": "string"},
            {"name": "score", "type": ["null", "double"]},
            {"name": "ok", "type": "boolean"},
        ],
    }
    avro_lite.write_avro(
        str(d / "b.avro"),
        [{"id": 9.5, "name": "z", "score": None, "ok": False}],
        schema2,
        "null",
    )
    with pytest.raises(Exception, match="names AND types"):
        readers.read_avro(spark, str(d)).collect()


def test_avro_empty_dir_raises(spark, tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(Exception):
        readers.read_avro(spark, str(tmp_path / "empty"))


def test_xml_selector_path_child_combinator(spark, tmp_path):
    # Reference selector semantics (FileUploader.tsx:65-93): "items > item"
    # must NOT match an <item> nested under <related>.
    doc = """<root>
  <items>
    <item><id>1</id><v>a</v></item>
    <item><id>2</id><v>b</v></item>
  </items>
  <related>
    <item><id>99</id><v>z</v></item>
  </related>
</root>
"""
    path = _write(tmp_path, "sel.xml", doc)
    over = readers.read_xml(spark, path, row_tag="item")
    assert over.count() == 3  # bare tag over-matches by design
    scoped = readers.read_xml(spark, path, row_tag="items > item")
    ids = sorted(r.id for r in scoped.collect())
    assert ids == ["1", "2"]
    # descendant combinator: "root item" matches all three
    desc = readers.read_xml(spark, path, row_tag="root item")
    assert desc.count() == 3


def test_multifile_ragged_key_union(spark, tmp_path):
    # Executor-side key union across files with differing columns (the
    # Python-codec path, where the ragged contract lives): the schema is
    # the first-seen-ordered union and missing cells are ''.
    _write(tmp_path, "p1.csv", "a,b\n1,2\n", encoding="euc-kr")
    _write(tmp_path, "p2.csv", "a,c\n3,4\n", encoding="euc-kr")
    df = readers.read_csv(spark, str(tmp_path / "*.csv"), encoding="euc-kr")
    assert set(df.columns) == {"a", "b", "c"}
    rows = {r.a: r.asDict() for r in df.collect()}
    assert rows["1"]["c"] == "" and rows["3"]["b"] == ""


def test_xml_tables_multifile_corpus(spark, tmp_path):
    # read_xml_tables over a glob: same-named tables union across files.
    for i, doc in enumerate(
        [
            "<r><t><x>1</x></t><t><x>2</x></t></r>",
            "<r><t><x>3</x><y>9</y></t><t><x>4</x></t></r>",
        ]
    ):
        _write(tmp_path, f"f{i}.xml", doc)
    tables = readers.read_xml_tables(spark, str(tmp_path / "*.xml"))
    (name,) = [k for k in tables if k.endswith("t")]
    df = tables[name]
    assert df.count() == 4
    assert set(df.columns) == {"x", "y"}


def test_xml_writer_golden_template(spark, tmp_path):
    df = spark.createDataFrame(
        [("1", "a<b", "x, y")], ["id", "expr", "bad name!"]
    )
    out = str(tmp_path / "out.xml")
    writers.write_xml(df, out)
    text = open(out).read()
    # K4 golden semantics: 2-space indent, &<> escaped, invalid XML
    # names via <col name="...">  (FileUploader.tsx:128-161).
    assert text == (
        "<rows>\n"
        "  <row>\n"
        "    <id>1</id>\n"
        "    <expr>a&lt;b</expr>\n"
        '    <col name="bad name!">x, y</col>\n'
        "  </row>\n"
        "</rows>\n"
    )


def test_xml_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("1", "x"), ("2", "y & z")], ["id", "v"])
    out = str(tmp_path / "rt.xml")
    writers.write_xml(df, out)
    back = readers.read_xml(spark, out, row_tag="row")
    rows = {r.id: r.v for r in back.collect()}
    assert rows == {"1": "x", "2": "y & z"}


def test_xml_writer_handles_dotted_columns(spark, tmp_path):
    # read_xml flattens nested elements to dotted names ("dims.w");
    # writing such a frame back must not parse the dot as struct access.
    doc = "<r><row><a>1</a><b><c>2</c></b></row><row><a>3</a><b><c>4</c></b></row></r>"
    path = _write(tmp_path, "n.xml", doc)
    df = readers.read_xml(spark, path, row_tag="row")
    assert "b.c" in df.columns
    out = str(tmp_path / "back.xml")
    writers.write_xml(df, out)  # regression: crashed UNRESOLVED_COLUMN
    text = open(out).read()
    assert "<b.c>2</b.c>" in text


def test_xml_tables_mixed_corpus_drops_textonly_files(spark, tmp_path):
    # Reference fallback contract: '#text' pseudo-table only when NO
    # file has a detectable table; mixed corpora drop table-less files.
    _write(tmp_path, "t.xml", "<r><t><x>1</x></t><t><x>2</x></t></r>")
    _write(tmp_path, "plain.xml", "<note>just text</note>")
    tables = readers.read_xml_tables(spark, str(tmp_path / "*.xml"))
    assert "#text" not in tables
    assert any(k.endswith("t") for k in tables)
    # all-text corpus still yields the pseudo-table
    only = readers.read_xml_tables(spark, str(tmp_path / "plain.xml"))
    assert set(only) == {"#text"} and only["#text"].count() == 1


# ---------------------------------------------------------------------------
# Encodings (S11)
# ---------------------------------------------------------------------------


def test_euc_kr_csv(spark, tmp_path):
    path = _write(tmp_path, "kr.csv", "이름,값\n홍길동,1\n", encoding="euc-kr")
    df = readers.read_csv(spark, path, encoding="euc-kr")
    assert df.columns == ["이름", "값"]
    assert df.collect()[0]["이름"] == "홍길동"


# ---------------------------------------------------------------------------
# Excel bridge (S7/K5) — gated on engine availability
# ---------------------------------------------------------------------------


def test_excel_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("1", "a & <b>"), ("2", "line éü"), ("3", "")], ["id", "v"]
    )
    out = str(tmp_path / "wb.xlsx")
    writers.write_excel({"s1": df, "s/1": df}, out)
    sheets = readers.read_excel(spark, out)
    assert len(sheets) == 2
    (name,) = [n for n in sheets if n == "s1"]
    back = {r.id: r.v for r in sheets[name].collect()}
    assert back == {"1": "a & <b>", "2": "line éü", "3": ""}


def test_excel_multisheet_convert(spark, tmp_path):
    src = tmp_path / "t.csv"
    src.write_text("id,v\n1,x\n2,y\n")
    out_dir = str(tmp_path / "outx")
    outputs = convert.convert(spark, [str(src)], "xlsx", out_dir)
    sheets = readers.read_excel(spark, outputs["t"])
    assert list(sheets) == ["t"]
    assert sheets["t"].count() == 2


def test_sheet_name_sanitize():
    taken: set[str] = set()
    a = readers.sanitize_sheet_name("bad/name:with*chars", taken)
    assert "/" not in a and ":" not in a and len(a) <= 31
    b = readers.sanitize_sheet_name("bad/name:with*chars", taken)
    assert b != a and b.endswith("_1")


# ---------------------------------------------------------------------------
# convert() orchestrator + zip (K6) + input dedup (P4)
# ---------------------------------------------------------------------------


def test_convert_csv_to_xml_and_zip(spark, tmp_path):
    src = _write(tmp_path, "t.csv", "id,v\n1,a\n2,b\n")
    out_dir = str(tmp_path / "out")
    outputs = convert.convert(spark, [src], "xml", out_dir)
    assert list(outputs) == ["t"]
    back = readers.read_xml(spark, outputs["t"], row_tag="row")
    assert back.count() == 2
    zp = str(tmp_path / "pack.zip")
    names = writers.zip_directory(out_dir, zp)
    assert names and zipfile.ZipFile(zp).namelist() == names


def test_convert_dedupe_inputs(tmp_path):
    a = _write(tmp_path, "same.csv", "x\n1\n")
    sub = tmp_path / "sub"
    sub.mkdir()
    b = str(sub / "same.csv")
    open(b, "w").write("x\n1\n")
    assert convert.dedupe_inputs([a, b, a]) == [a]


def test_convert_xml_to_csv(spark, tmp_path):
    src = _write(tmp_path, "c.xml", XML_DOC)
    out_dir = str(tmp_path / "out2")
    outputs = convert.convert(spark, [src], "csv", out_dir, xml_row_tag="item")
    df = readers.read_csv(spark, outputs["c"])
    assert df.count() == 2 and "name" in df.columns


def test_flatten_nested_structs_to_dotted_names(spark):
    from data__converter_spark.schema import fill_missing_empty, flatten

    df = spark.createDataFrame(
        [(1, ("x", (2, None)), ["k"])],
        "id int, a struct<b:string, c:struct<d:int, e:string>>, tags array<string>",
    )
    flat = flatten(df)
    assert flat.columns == ["id", "a.b", "a.c.d", "a.c.e", "tags"]
    row = fill_missing_empty(flat).collect()[0]
    assert row["a.b"] == "x" and row["a.c.d"] == 2 and row["a.c.e"] == ""
    assert row["tags"] == ["k"]


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC read/write round-trip; the filter must reach the ORC scan
    (searchArgument pushdown) and the projection must prune."""
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(100)], "id long, name string, v double"
    )
    p = str(tmp_path / "t.orc")
    writers.write_orc(df, p)
    back = readers.read_orc(spark, p)
    assert back.count() == 100
    q = back.filter("id >= 90").select("id", "name")
    assert q.count() == 10
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters")[1][:80]
    assert "v:" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_avro_lite_union_branch_order(tmp_path):
    """[T, "null"] unions (null declared SECOND) must round-trip: the
    branch index follows the declared order, not a hardcoded
    ["null", T] (regression: decoding a present double as branch 0 =
    null desyncs the byte stream)."""
    from data__converter_spark.io import avro_lite

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": ["double", "null"]},
            {"name": "b", "type": ["null", "long"]},
        ],
    }
    rows = [{"a": 1.5, "b": None}, {"a": None, "b": 7}, {"a": -2.25, "b": 0}]
    p = str(tmp_path / "u.avro")
    avro_lite.write_avro(p, rows, schema)
    with open(p, "rb") as f:
        _, got = avro_lite.read_avro_bytes(f.read())
    assert got == rows


def test_avro_truncated_small_file_blames_the_file_not_the_cap(spark, tmp_path):
    # a genuinely cut-off file SMALLER than the peek must be diagnosed
    # as a truncated file (partial upload), not as exceeding the peek
    # cap, and never escalate to the 8 MiB retry
    from data__converter_spark.io import avro_lite

    d = tmp_path / "cut"
    d.mkdir()
    avro_lite.write_avro(str(d / "a.avro"), AVRO_ROWS, AVRO_SCHEMA, "null")
    raw = (d / "a.avro").read_bytes()
    (d / "a.avro").write_bytes(raw[:20])  # cut mid-metadata-map
    with pytest.raises(ValueError, match="truncated mid-header"):
        readers.read_avro(spark, str(d))

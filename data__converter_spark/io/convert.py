"""Convert tool orchestrator (SURVEY §3.1 handleConvert).

``convert(spark, inputs, out_fmt, out_dir)`` is the engine equivalent
of FileUploader.tsx:338-364: each input file parses by extension to one
or more named tables, then every table writes in the requested output
format. Lazy plans; one action per output (SURVEY §3.1 "Spark shape").

Extension dispatch mirrors the reference accept-list (P3,
FileUploader.tsx:242-250); queued-twice inputs drop on (name, size)
(P4, :251-253).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import readers, writers

TABLE_EXTS = {".csv", ".tsv", ".txt", ".json", ".xml", ".xlsx", ".xls"}


def _base(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def parse_file(
    spark: SparkSession,
    path: str,
    encoding: str = "utf-8",
    xml_row_tag: str | None = None,
    txt_as_lines: bool = True,
) -> dict[str, DataFrame]:
    """One input file -> {table_name: DataFrame} by extension."""
    ext = os.path.splitext(path)[1].lower()
    if ext not in TABLE_EXTS:
        raise ValueError(f"unsupported extension {ext!r} for {path}")
    if ext in {".csv", ".tsv"}:
        return {_base(path): readers.read_table_auto(spark, path, encoding=encoding)}
    if ext == ".txt":
        if txt_as_lines:
            return {_base(path): readers.read_txt_lines(spark, path, encoding=encoding)}
        return {_base(path): readers.read_table_auto(spark, path, encoding=encoding)}
    if ext == ".json":
        return {_base(path): readers.read_json(spark, path, encoding=encoding)}
    if ext == ".xml":
        if xml_row_tag:
            return {
                _base(path): readers.read_xml(
                    spark, path, row_tag=xml_row_tag, encoding=encoding
                )
            }
        tables = readers.read_xml_tables(spark, path, encoding=encoding)
        return {f"{_base(path)}_{k}": v for k, v in tables.items()}
    # .xlsx / .xls
    sheets = readers.read_excel(spark, path)
    return {f"{_base(path)}_{k}": v for k, v in sheets.items()}


def dedupe_inputs(paths: list[str]) -> list[str]:
    """P4: drop inputs already queued with the same (name, size)."""
    seen: set[tuple[str, int]] = set()
    out: list[str] = []
    for p in paths:
        key = (os.path.basename(p), os.path.getsize(p))
        if key not in seen:
            seen.add(key)
            out.append(p)
    return out


def convert(
    spark: SparkSession,
    inputs: list[str],
    out_fmt: str,
    out_dir: str,
    encoding: str = "utf-8",
    xml_row_tag: str | None = None,
) -> dict[str, str]:
    """Convert N input files to ``out_fmt``; returns {table: output path}.

    out_fmt: 'csv' | 'txt' | 'xml' | 'json' | 'xlsx' | 'parquet'.
    'xlsx' packs every table as one sheet of a single workbook —
    the reference's other-to-excel mode (FileUploader.tsx:306-335).
    """
    os.makedirs(out_dir, exist_ok=True)
    tables: dict[str, DataFrame] = {}
    for path in dedupe_inputs(inputs):
        tables.update(
            parse_file(spark, path, encoding=encoding, xml_row_tag=xml_row_tag)
        )

    outputs: dict[str, str] = {}
    if out_fmt == "xlsx":
        out = os.path.join(out_dir, "workbook.xlsx")
        writers.write_excel(tables, out)
        return {name: out for name in tables}

    for name, df in tables.items():
        out = os.path.join(out_dir, f"{name}.{out_fmt}")
        if out_fmt == "csv":
            writers.write_csv(df, out)
        elif out_fmt == "txt":
            writers.write_txt(df, out)
        elif out_fmt == "json":
            df.write.mode("overwrite").json(out)
        elif out_fmt == "xml":
            writers.write_xml(df, out)
        elif out_fmt == "parquet":
            df.write.mode("overwrite").parquet(out)
        else:
            raise ValueError(f"unsupported output format {out_fmt!r}")
        outputs[name] = out
    return outputs

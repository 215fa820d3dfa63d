"""Minimal stdlib xlsx codec (S7/K5 without external engines).

xlsx is a zip of XML parts. This implements the subset the convert
tool needs — multi-sheet workbooks of string/number cells — with no
dependency beyond ``zipfile`` + ``xml.etree``:

- write: inline-string cells (``t="inlineStr"``), one worksheet per
  sheet, minimal [Content_Types]/rels plumbing. Readable by Excel,
  LibreOffice, pandas.
- read: worksheet cell parse with A1-ref column mapping; supports
  inline strings, sharedStrings.xml (what real Excel emits), and
  numeric cells (read as their literal string — the engine's
  stringify-at-the-edge contract, SURVEY §1.4).

Scale note (SURVEY §7.3.5): xlsx is a single-file convenience format;
this codec exists for interchange fidelity with the reference, parquet
is the at-scale substrate. Size cap enforced by callers.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_SHEET_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>
"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>
"""


_X_ESC = re.compile(r"_x([0-9A-Fa-f]{4})_")


def _xml_legal(ch: str) -> bool:
    o = ord(ch)
    return (
        o in (0x9, 0xA, 0xD)
        or 0x20 <= o <= 0xD7FF
        or 0xE000 <= o <= 0xFFFD
        or 0x10000 <= o <= 0x10FFFF
    )


def _ooxml_escape(s: str) -> str:
    """Chars illegal in XML 1.0 -> OOXML ``_xHHHH_`` escapes (the
    convention Excel itself uses); literal ``_xHHHH_`` text guards its
    underscore as ``_x005F_`` first."""
    s = _X_ESC.sub(lambda m: f"_x005F_x{m.group(1)}_", s)
    if all(_xml_legal(c) for c in s):
        return s
    return "".join(c if _xml_legal(c) else f"_x{ord(c):04X}_" for c in s)


def _ooxml_unescape(s: str) -> str:
    return _X_ESC.sub(lambda m: chr(int(m.group(1), 16)), s)


def _col_letter(i: int) -> str:
    """0-based column index -> A1 letters."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _col_index(ref: str) -> int:
    """A1 cell ref -> 0-based column index."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    i = 0
    for ch in letters:
        i = i * 26 + (ord(ch) - ord("A") + 1)
    return i - 1


def write_workbook(path: str, sheets: dict[str, tuple[list[str], list[list[str]]]]) -> None:
    """Write {sheet_name: (columns, rows-of-strings)} as one xlsx."""
    names = list(sheets)
    sheet_overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    wb_sheets = "\n".join(
        f'<sheet name="{escape(n, {chr(34): "&quot;"})}" sheetId="{i+1}" r:id="rId{i+1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i+1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i+1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )

    def sheet_xml(cols: list[str], rows: list[list[str]]) -> str:
        def row_xml(r_idx: int, cells: list[str]) -> str:
            parts = []
            for c_idx, v in enumerate(cells):
                if v is None or v == "":
                    continue
                ref = f"{_col_letter(c_idx)}{r_idx}"
                parts.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(_ooxml_escape(str(v)))}</t></is></c>"
                )
            return f'<row r="{r_idx}">{"".join(parts)}</row>'

        body = [row_xml(1, cols)]
        body += [row_xml(i + 2, r) for i, r in enumerate(rows)]
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(body)}</sheetData></worksheet>'
        )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=sheet_overrides)
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, n in enumerate(names):
            cols, rows = sheets[n]
            zf.writestr(f"xl/worksheets/sheet{i+1}.xml", sheet_xml(cols, rows))


def read_workbook(path: str) -> dict[str, tuple[list[str], list[list[str]]]]:
    """Read an xlsx into {sheet_name: (columns, rows-of-strings)}.

    First row is the header (sheet_to_json semantics, S7); short rows
    pad with ``''``. Cells render as strings (shared/inline strings
    verbatim, numerics as their literal text).
    """
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_SHEET_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_SHEET_NS}t")))

        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target")
            for r in rels.findall(f"{_PKG_REL_NS}Relationship")
        }
        out: dict[str, tuple[list[str], list[list[str]]]] = {}
        for sheet in wb.find(f"{_SHEET_NS}sheets").findall(f"{_SHEET_NS}sheet"):
            name = sheet.get("name")
            target = rel_target[sheet.get(f"{_REL_NS}id")]
            part = target if target.startswith("xl/") else f"xl/{target}"
            ws = ET.fromstring(zf.read(part))
            grid: list[list[str]] = []
            for row in ws.iter(f"{_SHEET_NS}row"):
                cells: dict[int, str] = {}
                for c in row.findall(f"{_SHEET_NS}c"):
                    idx = _col_index(c.get("r", "A1"))
                    t = c.get("t")
                    if t == "inlineStr":
                        is_el = c.find(f"{_SHEET_NS}is")
                        v = _ooxml_unescape(
                            "".join(
                                x.text or "" for x in is_el.iter(f"{_SHEET_NS}t")
                            )
                        ) if is_el is not None else ""
                    else:
                        v_el = c.find(f"{_SHEET_NS}v")
                        v = v_el.text if v_el is not None and v_el.text else ""
                        if t == "s" and v != "":
                            v = _ooxml_unescape(shared[int(v)])
                    cells[idx] = v
                width = max(cells) + 1 if cells else 0
                grid.append([cells.get(i, "") for i in range(width)])
            if not grid:
                out[name] = ([], [])
                continue
            header = [h if h else f"col{i}" for i, h in enumerate(grid[0])]
            rows = [
                r[: len(header)] + [""] * (len(header) - len(r)) for r in grid[1:]
            ]
            out[name] = (header, rows)
        return out

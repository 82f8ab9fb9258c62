"""Dependency-free XLSX (ECMA-376 SpreadsheetML) reader and writer.

The reference ingests Excel workbooks with ``pd.read_excel`` on the
driver (ff_projects/extract.py:28-49, biospecimen/extract.py:66-91,
odk/extract.py:18-56, sumo/extract.py:97-125) and writes per-group
XLSX reports (sinks/s3.py:136-193) — both through openpyxl, which this
container does not ship. An .xlsx file is just a ZIP of small XML parts
(ECMA-376 part 1, SpreadsheetML), so this module implements the subset
those sources actually touch with nothing but ``zipfile`` +
``xml.etree``: tabular sheets of strings / numbers / booleans / blanks.

Scope (deliberately small, honestly documented):
- cell types: inline strings, shared strings (rich-text runs are
  concatenated), numbers (int vs float inferred), booleans, formula
  *cached* values, blanks; no styles, dates-as-serials, merged cells,
  or formula evaluation.
- the writer emits deterministic bytes for identical input (fixed zip
  timestamps, fixed part order, inline strings), so report manifests
  can pin a sha256 the way the CSV branch does.

Executor-side use: ``read_xlsx`` is the pandas-callback payload for the
generic vectorized scan (sources/file_scan.py) — one (file, sheet) work
unit per call, never a driver loop.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Mapping
from typing import Any
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import pandas as pd

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_CELL_REF_RE = re.compile(r"^([A-Z]+)([0-9]+)$")
_INT_RE = re.compile(r"^-?[0-9]+$")
# fixed DOS timestamp -> byte-identical archives for identical input
_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)
# XML 1.0 forbids these control characters entirely — escape() cannot
# represent them, so a cell containing one must fail at write time
# instead of producing a workbook Excel/ET.fromstring reject
_XML_INVALID_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _local(tag: str) -> str:
    """Element tag without its namespace (lenient across producers)."""
    return tag.rsplit("}", 1)[-1]


def _col_to_index(letters: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 (ECMA-376 A1 reference style)."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _index_to_col(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


# --------------------------------------------------------------------- reader


def _text_runs(elem: ET.Element) -> str:
    """Concatenate every <t> descendant — plain AND rich-text strings."""
    return "".join(t.text or "" for t in elem.iter() if _local(t.tag) == "t")


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        raw = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(raw)
    return [_text_runs(si) for si in root if _local(si.tag) == "si"]


def _workbook_sheets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, zip part path)] in workbook order, via the
    workbook relationships part (sheet order in the XML is the display
    order; the rel target is the physical part)."""
    rels: dict[str, str] = {}
    rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rel_root:
        target = rel.get("Target", "")
        if target.startswith("/"):
            target = target.lstrip("/")
        else:
            target = "xl/" + target
        rels[rel.get("Id", "")] = target
    out: list[tuple[str, str]] = []
    wb_root = ET.fromstring(zf.read("xl/workbook.xml"))
    for sheets in wb_root:
        if _local(sheets.tag) != "sheets":
            continue
        for sheet in sheets:
            rid = sheet.get(f"{{{_REL_NS}}}id") or sheet.get("id", "")
            out.append((sheet.get("name", ""), rels[rid]))
    return out


def _cell_value(cell: ET.Element, shared: list[str]) -> Any:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        for child in cell:
            if _local(child.tag) == "is":
                return _text_runs(child)
        return ""
    v = None
    for child in cell:
        if _local(child.tag) == "v":
            v = child.text or ""
            break
    if v is None:
        return None
    if ctype == "s":
        return shared[int(v)]
    if ctype == "str":  # formula's cached string value
        return v
    if ctype == "b":
        return v == "1"
    if ctype == "e":  # cell error (#DIV/0! …) -> missing
        return None
    if _INT_RE.match(v):
        return int(v)
    try:
        return float(v)
    except ValueError:  # lenient: unknown producer wrote a bare string
        return v


def _parse_sheet(raw: bytes, shared: list[str]) -> pd.DataFrame:
    root = ET.fromstring(raw)
    rows: dict[int, dict[int, Any]] = {}
    max_col = -1
    for elem in root.iter():
        if _local(elem.tag) != "row":
            continue
        r_attr = elem.get("r")
        row_idx = int(r_attr) - 1 if r_attr else (max(rows) + 1 if rows else 0)
        cells: dict[int, Any] = {}
        next_col = 0
        for cell in elem:
            if _local(cell.tag) != "c":
                continue
            ref = cell.get("r")
            if ref:
                m = _CELL_REF_RE.match(ref)
                col_idx = _col_to_index(m.group(1)) if m else next_col
            else:  # r is optional in the spec: cells are then sequential
                col_idx = next_col
            next_col = col_idx + 1
            val = _cell_value(cell, shared)
            if val is not None:
                cells[col_idx] = val
                max_col = max(max_col, col_idx)
        rows[row_idx] = cells
    if not rows:
        return pd.DataFrame()
    n_rows = max(rows) + 1
    header = rows.get(0, {})
    columns = [
        str(header[i]) if i in header else f"Unnamed: {i}"
        for i in range(max_col + 1)
    ]
    records = [
        [rows.get(r, {}).get(c) for c in range(max_col + 1)]
        for r in range(1, n_rows)
    ]
    return pd.DataFrame(records, columns=columns).infer_objects()


def read_xlsx(
    source: str | bytes,
    sheet_name: str | int | None = 0,
) -> pd.DataFrame | dict[str, pd.DataFrame]:
    """Parse an .xlsx workbook into pandas frame(s).

    ``sheet_name`` follows ``pd.read_excel``: an int positional index or
    str name returns one DataFrame; ``None`` returns ``{name: frame}``
    for every sheet in workbook order. Row 1 is the header; blank cells
    come back as ``None``/NaN (the ``keep_default_na=False`` shape the
    reference relies on — no magic 'NA'-string conversion ever happens).
    """
    buf = io.BytesIO(source) if isinstance(source, (bytes, bytearray)) else source
    with zipfile.ZipFile(buf) as zf:
        shared = _shared_strings(zf)
        sheets = _workbook_sheets(zf)
        if sheet_name is None:
            return {
                name: _parse_sheet(zf.read(part), shared) for name, part in sheets
            }
        if isinstance(sheet_name, int):
            name, part = sheets[sheet_name]
            return _parse_sheet(zf.read(part), shared)
        for name, part in sheets:
            if name == sheet_name:
                return _parse_sheet(zf.read(part), shared)
        raise KeyError(f"no sheet named {sheet_name!r}; have {[n for n, _ in sheets]}")


# --------------------------------------------------------------------- writer


def _xml_cell(ref: str, value: Any) -> str | None:
    if hasattr(value, "item"):  # numpy scalar -> plain Python value
        value = value.item()
    if value is None or (isinstance(value, float) and value != value):
        return None  # blank: omit the cell entirely
    if isinstance(value, bool):  # before int: bool is an int subclass
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and value in (float("inf"), float("-inf")):
            # SpreadsheetML has no non-finite number literal; <v>inf</v>
            # would serialize fine and corrupt the workbook silently
            raise ValueError(f"non-finite float at cell {ref}: {value!r}")
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    raw = str(value)
    if _XML_INVALID_RE.search(raw):
        bad = _XML_INVALID_RE.search(raw).group(0)
        raise ValueError(
            f"XML-invalid control character {bad!r} at cell {ref}; "
            "strip control characters before writing the report"
        )
    text = escape(raw)
    space = ' xml:space="preserve"' if text != text.strip() else ""
    return f'<c r="{ref}" t="inlineStr"><is><t{space}>{text}</t></is></c>'


def _sheet_xml(pdf: pd.DataFrame) -> bytes:
    lines = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<worksheet xmlns="{_MAIN_NS}"><sheetData>',
    ]
    header = list(pdf.columns)
    all_rows = [header, *(list(t) for t in pdf.itertuples(index=False))]
    for r, values in enumerate(all_rows, start=1):
        cells = [
            c
            for i, v in enumerate(values)
            if (c := _xml_cell(f"{_index_to_col(i)}{r}", v)) is not None
        ]
        lines.append(f'<row r="{r}">{"".join(cells)}</row>')
    lines.append("</sheetData></worksheet>")
    return "\n".join(lines).encode("utf-8")


def xlsx_bytes(sheets: Mapping[str, pd.DataFrame]) -> bytes:
    """Serialize ``{sheet name: frame}`` to a workbook, byte-stable for
    identical input (report manifests sha256 the result)."""
    if not sheets:
        raise ValueError("a workbook needs at least one sheet")
    names = list(sheets)
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
        'package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        f"{overrides}</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    for name in names:
        # sheet names flow in from group values (write_group_reports),
        # the same untrusted source as cell text — the same fail-loudly
        # guard applies: quoteattr escapes quotes but cannot represent
        # XML-1.0-forbidden control characters at all
        if _XML_INVALID_RE.search(name):
            bad = _XML_INVALID_RE.search(name).group(0)
            raise ValueError(
                f"XML-invalid control character {bad!r} in sheet name "
                f"{name!r}; strip control characters before writing"
            )
    sheet_tags = "".join(
        # quoteattr, not escape: escape() leaves '"' alone, and sheet
        # names (entity names from write_group_reports) may contain one
        f'<sheet name={quoteattr(name)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, name in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_MAIN_NS}" xmlns:r="{_REL_NS}">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.'
            'org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        parts: list[tuple[str, bytes]] = [
            ("[Content_Types].xml", content_types.encode()),
            ("_rels/.rels", root_rels.encode()),
            ("xl/workbook.xml", workbook.encode()),
            ("xl/_rels/workbook.xml.rels", wb_rels.encode()),
            *(
                (f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(sheets[name]))
                for i, name in enumerate(names)
            ),
        ]
        for part_name, payload in parts:
            zf.writestr(zipfile.ZipInfo(part_name, date_time=_ZIP_EPOCH), payload)
    return buf.getvalue()


def write_xlsx(path: str, sheets: Mapping[str, pd.DataFrame]) -> None:
    with open(path, "wb") as fh:
        fh.write(xlsx_bytes(sheets))

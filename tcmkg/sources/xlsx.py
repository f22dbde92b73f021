"""Minimal self-contained .xlsx reader (stdlib only: zipfile + ElementTree).

S5 support without an external engine: the reference loads SymMap herb /
syndrome dimension tables with pd.read_excel (extract_herb.py:57-58,
merge_tcm_symptom.py:20-22) — small curated workbooks, one header row, no
merged cells or formulas-to-evaluate. An .xlsx file is a zip of ECMA-376
XML parts; for that table shape a complete reader needs only:

  xl/workbook.xml            sheet names -> relationship ids
  xl/_rels/workbook.xml.rels relationship ids -> sheet part paths
  xl/sharedStrings.xml       the shared-string table (t="s" cells)
  xl/worksheets/sheetN.xml   rows of cells: shared strings, inline
                             strings (t="inlineStr"), literal strings
                             (t="str"), booleans (t="b"), numbers (no t)

Cells are addressed A1-style; gaps become None. Numbers parse to
int when integral else float (pandas read_excel-like). This reader is for
small DIMENSION tables (driver-side, then spark.createDataFrame) — big
fact data should never arrive as xlsx.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

import pandas as pd

_NS = {
    "m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "p": "http://schemas.openxmlformats.org/package/2006/relationships",
}
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'Z'->25, 'AA'->26 …"""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall("m:si", _NS):
        # a shared string may be split into runs (<r><t>..</t></r>)
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _sheet_path(zf: zipfile.ZipFile, sheet: str | int) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid2target = {
        rel.get("Id"): rel.get("Target") for rel in rels.findall("p:Relationship", _NS)
    }
    sheets = wb.findall("m:sheets/m:sheet", _NS)
    if isinstance(sheet, int):
        if not 0 <= sheet < len(sheets):
            raise ValueError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
        chosen = sheets[sheet]
    else:
        by_name = {s.get("name"): s for s in sheets}
        if sheet not in by_name:
            raise ValueError(f"no sheet named {sheet!r}; have {sorted(by_name)}")
        chosen = by_name[sheet]
    target = rid2target[chosen.get(f"{{{_NS['r']}}}id")]
    return target if target.startswith("xl/") else f"xl/{target}"


def _cell_value(cell: ET.Element, shared: list[str]):
    t = cell.get("t")
    if t == "inlineStr":
        return "".join(x.text or "" for x in cell.iter(f"{{{_NS['m']}}}t"))
    v = cell.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    num = float(v.text)
    return int(num) if num.is_integer() else num


def read_xlsx(path: str, sheet: str | int = 0, header: bool = True) -> pd.DataFrame:
    """-> pandas DataFrame of one worksheet (first row = header by default)."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(_sheet_path(zf, sheet)))
        rows: list[dict[int, object]] = []
        for row in root.findall("m:sheetData/m:row", _NS):
            cells: dict[int, object] = {}
            for i, cell in enumerate(row.findall("m:c", _NS)):
                ref = cell.get("r")
                idx = _col_index(_CELL_REF.match(ref).group(1)) if ref else i
                cells[idx] = _cell_value(cell, shared)
            rows.append(cells)
    if not any(rows):  # no rows, or only formatting-only (cell-less) rows
        return pd.DataFrame()
    width = max(max(r) for r in rows if r) + 1
    grid = [[r.get(i) for i in range(width)] for r in rows]
    if header:
        cols = [str(c) if c is not None else f"col{i}" for i, c in enumerate(grid[0])]
        return pd.DataFrame(grid[1:], columns=cols)
    return pd.DataFrame(grid)

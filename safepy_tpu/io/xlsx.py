"""Minimal dependency-free .xlsx sheet reader.

The published Costanzo-2016 cluster-identity table ships as an Excel
workbook (reference safe_io.py:549-551 reads it with
``pd.read_excel(..., sheet_name="Global net. cluster gene list")``), but
pandas' Excel engines (openpyxl / xlrd / ...) are optional dependencies that
are frequently absent in production images — including this one. An .xlsx
file is a zip of XML parts with a small, stable schema (ECMA-376
SpreadsheetML), so the subset SAFE needs — one sheet selected by name,
shared/inline strings, numbers, blanks — is read here directly with
``zipfile`` + ``xml.etree``.

:func:`read_xlsx` mirrors ``pd.read_excel``'s output for that subset: first
row as header, ``NaN`` for blank cells, numeric cells as floats. The
plotting overlay uses it as an automatic fallback
(plotting._read_costanzo_clusters) whenever pandas raises for lack of an
engine.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")
_PKG_REL_NS = ("{http://schemas.openxmlformats.org/package/2006/"
               "relationships}")


def _cell_column(ref: str) -> int:
    """'BC12' -> 0-based column index 54."""
    col = 0
    for ch in ref:
        if not ch.isalpha():
            break
        col = col * 26 + (ord(ch.upper()) - ord("A") + 1)
    return col - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>; concatenate every text node
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_path(zf: zipfile.ZipFile, sheet_name: str) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rid = None
    for sheet in wb.iter(f"{_NS}sheet"):
        if sheet.get("name") == sheet_name:
            rid = sheet.get(f"{_REL_NS}id")
            break
    if rid is None:
        names = [s.get("name") for s in wb.iter(f"{_NS}sheet")]
        raise ValueError(f"sheet {sheet_name!r} not in workbook "
                         f"(sheets: {names})")
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels.iter(f"{_PKG_REL_NS}Relationship"):
        if rel.get("Id") == rid:
            target = rel.get("Target")
            # absolute package targets ('/xl/worksheets/...') are already
            # rooted; relative ones resolve against the workbook's xl/ dir
            if target.startswith("/"):
                return target.lstrip("/")
            return target if target.startswith("xl/") else "xl/" + target
    raise ValueError(f"workbook relationship {rid!r} missing")


def _cell_value(c, strings):
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(x.text or "" for x in c.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return np.nan
    if t == "s":
        return strings[int(v.text)]
    if t == "str":  # cached formula result
        return v.text
    if t == "b":
        return bool(int(v.text))
    try:
        f = float(v.text)
    except ValueError:  # malformed numeric cell: keep the raw text
        return v.text
    return int(f) if f.is_integer() and abs(f) < 2 ** 53 else f


def read_xlsx(path, sheet_name: str) -> pd.DataFrame:
    """One worksheet as a DataFrame, first row as the header —
    ``pd.read_excel(path, sheet_name=...)`` semantics for the value types
    SAFE consumes (strings, numbers, booleans, blanks)."""
    with zipfile.ZipFile(path) as zf:
        strings = _shared_strings(zf)
        root = ET.fromstring(zf.read(_sheet_path(zf, sheet_name)))
        rows: list[dict[int, object]] = []
        width = 0
        auto_row = 0
        for row in root.iter(f"{_NS}row"):
            # honor the explicit r= row index: writers may omit empty <row>
            # elements entirely, and pandas emits all-NaN rows there — a
            # silent skip would shift every later row's alignment
            r_attr = row.get("r")
            r_idx = int(r_attr) - 1 if r_attr else auto_row
            while len(rows) < r_idx:
                rows.append({})
            auto_row = r_idx + 1
            cells: dict[int, object] = {}
            auto_col = 0
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r")
                col = _cell_column(ref) if ref else auto_col
                auto_col = col + 1
                cells[col] = _cell_value(c, strings)
            rows.append(cells)
            if cells:
                width = max(width, max(cells) + 1)
    if not rows:
        return pd.DataFrame()
    grid = [[r.get(j, np.nan) for j in range(width)] for r in rows]
    header = [str(h) if not (isinstance(h, float) and np.isnan(h))
              else f"Unnamed: {j}" for j, h in enumerate(grid[0])]
    return pd.DataFrame(grid[1:], columns=header)

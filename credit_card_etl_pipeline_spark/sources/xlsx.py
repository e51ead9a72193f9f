"""Vendored minimal .xlsx reader/writer (stdlib only).

The reference ingests Excel statements via ``pandas.read_excel``
(etl.py:312-316), which needs an engine (openpyxl/xlrd) that is not a
hard dependency of this engine.  An .xlsx file is just a zip of XML, so
the subset a bank statement needs — one worksheet grid of strings and
numbers, shared-string and inline-string cells — parses fine with
``zipfile`` + ``xml.etree``:

* ``read_xlsx_rows`` returns the first worksheet as padded rows of cell
  strings (the same surface ``pd.read_excel(dtype=str)`` feeds the
  statement parser).
* ``write_minimal_xlsx`` emits a spec-valid single-sheet workbook using
  inline strings — enough to build test fixtures without an Excel
  engine.

Legacy binary ``.xls`` is NOT covered (not a zip container); that path
still requires a pandas engine.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile
from xml.sax.saxutils import escape

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _cell_col(ref: str | None, fallback: int) -> int:
    """'B3' → 1 (0-based column); cells without a ref fall back to the
    next sequential slot."""
    if not ref:
        return fallback
    col = 0
    for ch in ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return col - 1 if col else fallback


def _text_of(elem: ET.Element) -> str:
    """Concatenated text of every <t> descendant (rich-text runs)."""
    return "".join(
        (t.text or "") for t in elem.iter() if _local(t.tag) == "t"
    )


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    name = "xl/sharedStrings.xml"
    if name not in z.namelist():
        return []
    root = ET.fromstring(z.read(name))
    return [_text_of(si) for si in root if _local(si.tag) == "si"]


def _first_sheet_target(z: zipfile.ZipFile) -> str:
    """Worksheet part of the workbook's first sheet (rels-resolved)."""
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    by_id = {
        rel.get("Id"): rel.get("Target")
        for rel in rels
        if _local(rel.tag) == "Relationship"
    }
    for sheets in wb:
        if _local(sheets.tag) != "sheets":
            continue
        for sheet in sheets:
            rid = sheet.get(f"{{{_REL_NS}}}id") or sheet.get("id")
            target = by_id.get(rid)
            if target:
                target = target.lstrip("/")
                return target if target.startswith("xl/") else f"xl/{target}"
    raise ValueError("workbook has no resolvable sheets")


def _cell_value(c: ET.Element, shared: list[str]) -> str:
    kind = c.get("t", "n")
    if kind == "inlineStr":
        for child in c:
            if _local(child.tag) == "is":
                return _text_of(child)
        return ""
    v = ""
    for child in c:
        if _local(child.tag) == "v":
            v = child.text or ""
    if kind == "s":
        try:
            return shared[int(v)]
        except (ValueError, IndexError):
            return ""
    return v


def read_xlsx_rows(path: str) -> list[list[str]]:
    """First worksheet as rows of cell strings, right-padded to the
    widest row.  Missing cells (sparse refs) become ''."""
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        sheet = ET.fromstring(z.read(_first_sheet_target(z)))
        rows: list[list[str]] = []
        for elem in sheet.iter():
            if _local(elem.tag) != "row":
                continue
            cells: dict[int, str] = {}
            nxt = 0
            for c in elem:
                if _local(c.tag) != "c":
                    continue
                idx = _cell_col(c.get("r"), nxt)
                cells[idx] = _cell_value(c, shared)
                nxt = idx + 1
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i, "") for i in range(width)])
    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


# ------------------------------------------------------------------
# Minimal writer (test fixtures)
# ------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="{_PKG_REL_NS}">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="{_MAIN_NS}" xmlns:r="{_REL_NS}">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="{_PKG_REL_NS}">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def write_minimal_xlsx(path: str, rows: list[list[str]]) -> None:
    """Write ``rows`` as a single-sheet .xlsx using inline strings."""
    body = []
    for i, row in enumerate(rows, start=1):
        cells = "".join(
            f'<c r="{_col_letter(j)}{i}" t="inlineStr">'
            f"<is><t>{escape(str(v))}</t></is></c>"
            for j, v in enumerate(row)
        )
        body.append(f'<row r="{i}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_MAIN_NS}"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _col_letter(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters

"""Minimal from-scratch XLSX codec (no openpyxl/xlrd dependency).

S12 in SURVEY.md §2.1: the reference loads its city/postcode dimension
from an Excel workbook via ``pd.ExcelFile(...).parse(sheet)``
(``dataproviders/hu_generic.py:33-48``). openpyxl is not installed in
this environment, and an XLSX file is just a ZIP of small XML parts —
so the reader is implemented directly on stdlib ``zipfile`` +
``xml.etree``: workbook sheet-name → rel-id → worksheet part, shared
strings, inline strings, and numeric cells. Good enough for the
dimension feeds this source exists for (thousands of rows), with the
same sheet-addressing semantics as the reference's ExcelFile.parse.

A matching writer exists so tests can build deterministic fixtures
without any Excel library; it emits the same subset the parser reads
(shared strings + numbers), which keeps the round-trip honest.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
import zipfile

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(letters: str) -> int:
    """'A' -> 0, 'B' -> 1, ..., 'AA' -> 26."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _sheet_targets(zf: zipfile.ZipFile) -> dict[str, str]:
    """Sheet name → archive member path, via workbook.xml + its rels."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_target = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter(f"{_PKG_REL_NS}Relationship")
    }
    out = {}
    for sheet in wb.iter(f"{_NS}sheet"):
        target = rel_target[sheet.get(f"{_REL_NS}id")]
        if not target.startswith("/"):
            target = "xl/" + target
        else:
            target = target.lstrip("/")
        out[sheet.get("name")] = target
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    strings = []
    for si in root.iter(f"{_NS}si"):
        # concatenate all <t> runs (rich-text strings split into runs)
        strings.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return strings


def _cell_value(cell: ET.Element, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
    v = cell.findtext(f"{_NS}v")
    if v is None:
        return None
    if ctype == "s":
        return shared[int(v)]
    if ctype in ("str", "e"):
        return v
    if ctype == "b":
        return bool(int(v))
    # numeric: int when exact, else float (mirrors pandas' inference)
    f = float(v)
    return int(f) if f.is_integer() else f


def parse_xlsx(data: bytes, sheet: str) -> list[list]:
    """One worksheet → dense list-of-rows (None-padded), header included.

    ``sheet`` is the sheet NAME (the reference addresses sheets by name:
    ``xl.parse("Települések")``, hu_generic.py:31).
    """
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        targets = _sheet_targets(zf)
        if sheet not in targets:
            raise KeyError(
                f"sheet {sheet!r} not in workbook (has {sorted(targets)})"
            )
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(targets[sheet]))
        rows: list[list] = []
        max_w = 0
        for row_el in root.iter(f"{_NS}row"):
            cells: dict[int, object] = {}
            for c in row_el.iter(f"{_NS}c"):
                ref = c.get("r") or ""
                m = _CELL_REF.match(ref)
                ci = _col_index(m.group(1)) if m else len(cells)
                cells[ci] = _cell_value(c, shared)
            if not cells:
                rows.append([])
                continue
            w = max(cells) + 1
            max_w = max(max_w, w)
            rows.append([cells.get(i) for i in range(w)])
        return [r + [None] * (max_w - len(r)) for r in rows]


def write_xlsx(sheets: dict[str, list[list]]) -> bytes:
    """Deterministic minimal workbook: shared strings for str cells,
    numeric ``<v>`` otherwise. Fixture/writer twin of :func:`parse_xlsx`."""
    shared: list[str] = []
    shared_ix: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in shared_ix:
            shared_ix[s] = len(shared)
            shared.append(s)
        return shared_ix[s]

    sheet_xmls = []
    for rows in sheets.values():
        body = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, val in enumerate(row):
                if val is None:
                    continue
                ref = f"{_col_letters(ci)}{ri}"
                if isinstance(val, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
                elif isinstance(val, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{val}</v></c>')
                else:
                    esc = (
                        str(val)
                        .replace("&", "&amp;")
                        .replace("<", "&lt;")
                        .replace(">", "&gt;")
                    )
                    cells.append(f'<c r="{ref}" t="s"><v>{sref(esc)}</v></c>')
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(body)
            + "</sheetData></worksheet>"
        )

    names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        f'relationships"><sheets>{wb_sheets}</sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + f'<Relationship Id="rId{len(names) + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    shared_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
        'package.relationships+xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + '<Override PartName="/xl/sharedStrings.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        # fixed date_time keeps the fixture byte-stable across rebuilds
        def add(name: str, text: str) -> None:
            info = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, text)

        add("[Content_Types].xml", content_types)
        add("_rels/.rels", root_rels)
        add("xl/workbook.xml", workbook)
        add("xl/_rels/workbook.xml.rels", wb_rels)
        for i, xml_text in enumerate(sheet_xmls):
            add(f"xl/worksheets/sheet{i + 1}.xml", xml_text)
        add("xl/sharedStrings.xml", shared_xml)
    return buf.getvalue()

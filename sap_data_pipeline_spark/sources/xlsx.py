"""Minimal .xlsx codec — stdlib only (zipfile + ElementTree).

The reference's Excel surface (dim workbooks in, report workbooks out —
``pipelines/etl_upload_excel.py:143``, ``etl_StoreRP.py:204-213``) is
driver-side by design: workbooks are human-maintained dimension files and
human-read reports, never distributed data.  This container has no Excel
engine (openpyxl absent), but .xlsx is just a zip of SpreadsheetML parts,
and the subset dims/reports need — one sheet, strings + numbers — is
small enough to implement directly:

* reader: first worksheet, shared-string / inline-string / raw cells,
  sparse cells resolved via their ``r="B2"`` references;
* writer: inline strings (no sharedStrings part), numbers as native
  numeric cells, one sheet.

No styles, formulas, dates, or multi-sheet support — dim loading casts
everything through the schema-driven cleaner anyway
(``functions.cleaning.cast_to_schema``), so typed fidelity beyond
string/number adds nothing here.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")
# XML 1.0 forbids control characters other than \t \n \r; a single stray
# byte (common in scraped text) would make the whole part unparseable.
# Stripped, not substituted — same policy as openpyxl's ILLEGAL_CHARACTERS_RE.
_ILLEGAL_XML = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x84\x86-\x9f\ud800-\udfff￾￿]"
)


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, … 'AA'→26 (cell ref letters → 0-based column)."""
    m = _CELL_REF.match(ref)
    n = 0
    for ch in (m.group(1) if m else "A"):
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_WB_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)


def _first_sheet_part(z: zipfile.ZipFile) -> str:
    """Resolve the FIRST sheet in workbook order via workbook.xml + its
    rels part — a lexicographic filename sort would put sheet10.xml
    before sheet2.xml and ignores the workbook's declared order
    entirely.  Falls back to numeric-suffix part sort for writers that
    omit the workbook parts."""
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rid = wb.find(f"{_NS}sheets/{_NS}sheet").get(f"{_WB_REL_NS}id")
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target = next(
            r.get("Target")
            for r in rels.findall(f"{_REL_NS}Relationship")
            if r.get("Id") == rid
        )
        part = target.lstrip("/") if target.startswith("/") else f"xl/{target}"
        if part in z.namelist():
            return part
    except (KeyError, AttributeError, StopIteration, ET.ParseError):
        pass
    sheets = sorted(
        (n for n in z.namelist()
         if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
    )
    if not sheets:
        raise ValueError("no worksheet found")
    return sheets[0]


def read_xlsx(path: str) -> tuple[list[str], list[list[str | None]]]:
    """Read the first worksheet as (header, rows) — every value a string
    (or None for empty cells), matching ``pd.read_excel(dtype=str)``."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                # join rich-text runs; missing <t> (empty si) → ""
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        try:
            root = ET.fromstring(z.read(_first_sheet_part(z)))
        except ValueError as e:
            raise ValueError(f"{e} in {path}") from None

    grid: list[list[str | None]] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, str | None] = {}
        # the r= attribute is optional; r-less cells occupy the column
        # after the previous cell (running index), not column A
        next_idx = 0
        for c in row.findall(f"{_NS}c"):
            ref = c.get("r")
            idx = _col_index(ref) if ref else next_idx
            next_idx = idx + 1
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                is_el = c.find(f"{_NS}is")
                val = "".join(t.text or "" for t in is_el.iter(f"{_NS}t")) if is_el is not None else None
            else:
                v = c.find(f"{_NS}v")
                raw = v.text if v is not None else None
                if raw is None:
                    val = None
                elif ctype == "s":
                    val = shared[int(raw)]
                else:  # 'n' (number), 'str' (formula string), 'b' (bool)
                    val = raw
            cells[idx] = val
        width = max(cells) + 1 if cells else 0
        grid.append([cells.get(i) for i in range(width)])

    if not grid:
        return [], []
    width = max(len(r) for r in grid)
    grid = [r + [None] * (width - len(r)) for r in grid]
    header = [h if h is not None else f"_c{i}" for i, h in enumerate(grid[0])]
    return header, grid[1:]


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)
_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        value = str(value)  # booleans as text; dims are string-typed anyway
    if isinstance(value, (int, float)):
        # coerce through builtin types: numpy scalars pass isinstance but
        # repr as 'np.float64(1.5)' under NumPy 2.x
        num = repr(float(value)) if isinstance(value, float) else str(int(value))
        return f'<c r="{ref}"><v>{num}</v></c>'
    text = _ILLEGAL_XML.sub("", str(value))
    return (
        f'<c r="{ref}" t="inlineStr"><is>'
        f'<t xml:space="preserve">{escape(text)}</t></is></c>'
    )


def write_xlsx(path: str, header: list[str], rows: list[list]) -> None:
    """Write (header, rows) as a single-sheet .xlsx."""
    buf = io.StringIO()
    buf.write(
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
    )
    for rnum, row in enumerate([list(header)] + [list(r) for r in rows], start=1):
        buf.write(f'<row r="{rnum}">')
        for cidx, val in enumerate(row):
            buf.write(_cell_xml(f"{_col_letters(cidx)}{rnum}", val))
        buf.write("</row>")
    buf.write("</sheetData></worksheet>")

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", buf.getvalue())

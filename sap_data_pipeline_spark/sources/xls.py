"""Minimal legacy ``.xls`` (BIFF8) codec — stdlib only.

Closes the last S2 environment gate (``pd.read_excel`` in the reference
accepts legacy workbooks, ``pipelines/etl_upload_excel.py:143``; this
container has no xlrd).  A ``.xls`` file is an OLE2/CFB compound
document holding a ``Workbook`` stream of BIFF8 records; the subset dim
workbooks need — first worksheet, strings + numbers — is parsed
directly from the two public specs (MS-CFB container, MS-XLS records):

* container: FAT built from the header DIFAT (+ DIFAT chain), directory
  walk, stream extraction from regular sectors or the mini-stream
  (streams under the 4096-byte cutoff live in the root's mini-FAT);
* records: BOUNDSHEET (first sheet in WORKBOOK order), SST including
  CONTINUE continuation (each continued character chunk restates its
  own compressed/UTF-16 flag byte), LABELSST / LABEL / NUMBER / RK /
  MULRK / BOOLERR / FORMULA (cached result + trailing STRING record).

No styles, dates-as-dates, or formula evaluation — same policy as the
``.xlsx`` codec (``sources.xlsx``): dims cast everything through the
schema-driven cleaner afterwards.  The writer emits inline-LABEL cells
in a regular-sector container (stream zero-padded past the mini-stream
cutoff — bytes after the final EOF record are never parsed); real
Excel-written fixtures weren't available in-container, so reader
correctness rests on the spec plus round-trip and hand-built-record
tests (including an SST split across CONTINUE).
"""

from __future__ import annotations

import struct

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_NOSTREAM = 0xFFFFFFFF

# BIFF8 record opcodes
_BOF, _EOF, _CONTINUE = 0x0809, 0x000A, 0x003C
_BOUNDSHEET, _SST = 0x0085, 0x00FC
_LABELSST, _LABEL, _NUMBER, _RK, _MULRK = 0x00FD, 0x0204, 0x0203, 0x027E, 0x00BD
_BOOLERR, _FORMULA, _STRING = 0x0205, 0x0006, 0x0207


# --------------------------------------------------------------------------
# CFB container
# --------------------------------------------------------------------------

def _cfb_read_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    if data[:8] != _MAGIC:
        raise ValueError("not an OLE2 compound document (bad magic)")
    ssz = 1 << struct.unpack_from("<H", data, 30)[0]
    mssz = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]
    difat = list(struct.unpack_from("<109I", data, 76))

    def sect(i: int) -> bytes:
        return data[(i + 1) * ssz:(i + 2) * ssz]

    s = difat_start
    for _ in range(n_difat):
        entries = struct.unpack_from(f"<{ssz // 4}I", sect(s))
        difat.extend(entries[:-1])
        s = entries[-1]
    fat: list[int] = []
    for fs in difat[:n_fat]:
        fat.extend(struct.unpack_from(f"<{ssz // 4}I", sect(fs)))

    def chain(start: int, table: list[int], get) -> bytes:
        out, s, seen = bytearray(), start, 0
        while s not in (_ENDOFCHAIN, _FREESECT) and s < len(table):
            out += get(s)
            s = table[s]
            seen += 1
            if seen > len(table):
                raise ValueError("cyclic sector chain")
        return bytes(out)

    dirdata = chain(dir_start, fat, sect)
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        e = dirdata[off:off + 128]
        nlen = struct.unpack_from("<H", e, 64)[0]
        name = e[:max(nlen - 2, 0)].decode("utf-16-le", "ignore")
        entries.append((name, e[66],
                        struct.unpack_from("<I", e, 116)[0],
                        struct.unpack_from("<I", e, 120)[0]))
    target = next(
        (e for e in entries if e[1] == 2 and e[0] in names), None
    )
    if target is None:
        raise ValueError(f"no {names} stream in compound document")
    _, _, start, size = target
    if size < cutoff:
        root = next(e for e in entries if e[1] == 5)
        ministream = chain(root[2], fat, sect)
        minifat_raw = chain(minifat_start, fat, sect)
        minifat = list(struct.unpack_from(f"<{len(minifat_raw) // 4}I", minifat_raw))

        def msect(i: int) -> bytes:
            return ministream[i * mssz:(i + 1) * mssz]

        raw = chain(start, minifat, msect)
    else:
        raw = chain(start, fat, sect)
    return raw[:size]


def _cfb_container(stream_name: str, payload: bytes) -> bytes:
    """Wrap one stream in a minimal regular-sector CFB container.

    The payload is zero-padded past the 4096-byte mini-stream cutoff so
    no mini-FAT is needed; BIFF parsers stop at the final EOF record and
    never see the padding."""
    payload = payload + b"\x00" * max(0, 4096 - len(payload))
    n_stream = (len(payload) + 511) // 512
    payload = payload + b"\x00" * (n_stream * 512 - len(payload))
    # layout: [fat sectors][1 dir sector][stream sectors]; solve n_fat
    n_fat = 1
    while (n_fat * 128) < n_fat + 1 + n_stream:
        n_fat += 1
    dir_sect = n_fat
    first_stream = n_fat + 1
    total = first_stream + n_stream
    fat = [_FATSECT] * n_fat + [_ENDOFCHAIN]  # dir: single sector
    fat += [first_stream + i + 1 for i in range(n_stream - 1)] + [_ENDOFCHAIN]
    fat += [_FREESECT] * (n_fat * 128 - len(fat))

    def dirent(name: str, typ: int, color: int, left: int, right: int,
               child: int, start: int, size: int) -> bytes:
        raw = name.encode("utf-16-le")
        return (raw + b"\x00" * (64 - len(raw))
                + struct.pack("<HBB3I", len(raw) + 2, typ, color, left, right, child)
                + b"\x00" * 36
                + struct.pack("<IQ", start, size))

    d = dirent("Root Entry", 5, 1, _NOSTREAM, _NOSTREAM, 1, _ENDOFCHAIN, 0)
    d += dirent(stream_name, 2, 1, _NOSTREAM, _NOSTREAM, _NOSTREAM,
                first_stream, len(payload))
    d += (b"\x00" * 64 + struct.pack("<HBB3I", 0, 0, 0, _NOSTREAM, _NOSTREAM,
                                     _NOSTREAM) + b"\x00" * 36
          + struct.pack("<IQ", 0, 0)) * 2
    header = bytearray(512)
    header[0:8] = _MAGIC
    # 24: minor, 26: major, 28: byte order, 30: sector shift, 32: mini
    # shift; 34-39 reserved; 40: n dir sectors (v3: 0), 44: n FAT, 48:
    # first dir sector, 52: transaction, 56: mini cutoff, 60: first
    # miniFAT, 64: n miniFAT, 68: first DIFAT, 72: n DIFAT.
    struct.pack_into("<HHHHH", header, 24, 0x003E, 0x0003, 0xFFFE, 9, 6)
    struct.pack_into("<9I", header, 40, 0, n_fat, dir_sect, 0, 4096,
                     _ENDOFCHAIN, 0, _ENDOFCHAIN, 0)
    difat = [*range(n_fat)] + [_FREESECT] * (109 - n_fat)
    struct.pack_into("<109I", header, 76, *difat)
    body = struct.pack(f"<{len(fat)}I", *fat) + d
    body += b"\x00" * ((n_fat + 1) * 512 - len(body))
    out = bytes(header) + body + payload
    assert len(out) == (total + 1) * 512
    return out


# --------------------------------------------------------------------------
# BIFF8 records
# --------------------------------------------------------------------------

class _StrCursor:
    """Reader over an SST record's payload parts (record + CONTINUEs).

    Fixed-width header fields refill across part boundaries untouched;
    CHARACTER data crossing into a new part consumes that part's fresh
    flags byte (the continued chunk may switch compressed ↔ UTF-16)."""

    def __init__(self, parts: list[bytes]):
        self.parts, self.i, self.p = parts, 0, 0

    def _avail(self) -> int:
        return len(self.parts[self.i]) - self.p

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n:
            if self._avail() == 0:
                self.i += 1
                self.p = 0
                continue
            take = min(n, self._avail())
            out += self.parts[self.i][self.p:self.p + take]
            self.p += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        out: list[str] = []
        while cch:
            if self._avail() == 0:
                self.i += 1
                high = bool(self.parts[self.i][0] & 1)
                self.p = 1
                continue
            width = 2 if high else 1
            take = min(cch, self._avail() // width)
            seg = self.parts[self.i][self.p:self.p + take * width]
            out.append(seg.decode("utf-16-le" if high else "latin-1"))
            self.p += take * width
            cch -= take
        return "".join(out)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read(2))[0]
        grbit = self.read(1)[0]
        c_run = struct.unpack("<H", self.read(2))[0] if grbit & 0x08 else 0
        cb_ext = struct.unpack("<I", self.read(4))[0] if grbit & 0x04 else 0
        s = self.read_chars(cch, bool(grbit & 0x01))
        self.read(4 * c_run + cb_ext)  # skip rich runs + phonetic block
        return s


def _records(stream: bytes, pos: int):
    while pos + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield op, stream[pos + 4:pos + 4 + ln], pos
        pos += 4 + ln


def _fmt_num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() and abs(v) < 1e16 else repr(v)


def _decode_rk(rk: int) -> float:
    if rk & 0x02:  # integer payload
        v = float(rk >> 2 if rk < (1 << 31) else (rk >> 2) - (1 << 30))
    else:
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if rk & 0x01 else v


def read_xls(path: str) -> tuple[list[str], list[list[str | None]]]:
    """Read the first worksheet (workbook order) as (header, rows) of
    strings/None — the same contract as ``sources.xlsx.read_xlsx``."""
    with open(path, "rb") as f:
        data = f.read()
    wb = _cfb_read_stream(data, ("Workbook", "Book"))

    sst: list[str] = []
    sheet_offsets: list[int] = []
    sst_parts: list[bytes] | None = None
    for op, payload, _pos in _records(wb, 0):
        if op == _SST:
            sst_parts = [payload]
        elif op == _CONTINUE and sst_parts is not None:
            sst_parts.append(payload)
        elif sst_parts is not None and op not in (_SST, _CONTINUE):
            cur = _StrCursor(sst_parts)
            _total, n_unique = struct.unpack("<II", cur.read(8))
            sst = [cur.read_string() for _ in range(n_unique)]
            sst_parts = None
        if op == _BOUNDSHEET:
            sheet_offsets.append(struct.unpack_from("<I", payload, 0)[0])
        elif op == _EOF:
            break
    if not sheet_offsets:
        raise ValueError(f"no BOUNDSHEET record in {path}")

    cells: dict[tuple[int, int], str | None] = {}
    pending_formula: tuple[int, int] | None = None
    for op, payload, _pos in _records(wb, sheet_offsets[0]):
        if op == _EOF:
            break
        if op == _LABELSST:
            r, c, _xf, isst = struct.unpack_from("<HHHI", payload)
            cells[(r, c)] = sst[isst]
        elif op == _LABEL:
            r, c, _xf = struct.unpack_from("<HHH", payload)
            cells[(r, c)] = _StrCursor([payload[6:]]).read_string()
        elif op == _NUMBER:
            r, c, _xf, v = struct.unpack_from("<HHHd", payload)
            cells[(r, c)] = _fmt_num(v)
        elif op == _RK:
            r, c, _xf, rk = struct.unpack_from("<HHHI", payload)
            cells[(r, c)] = _fmt_num(_decode_rk(rk))
        elif op == _MULRK:
            r, c0 = struct.unpack_from("<HH", payload)
            n = (len(payload) - 6) // 6
            for k in range(n):
                rk = struct.unpack_from("<I", payload, 4 + 6 * k + 2)[0]
                cells[(r, c0 + k)] = _fmt_num(_decode_rk(rk))
        elif op == _BOOLERR:
            r, c, _xf, val, is_err = struct.unpack_from("<HHHBB", payload)
            cells[(r, c)] = None if is_err else str(bool(val))
        elif op == _FORMULA:
            r, c, _xf = struct.unpack_from("<HHH", payload)
            result = payload[6:14]
            if result[6:8] == b"\xff\xff":
                if result[0] == 0:  # string result in trailing STRING record
                    pending_formula = (r, c)
                elif result[0] == 1:
                    cells[(r, c)] = str(bool(result[2]))
            else:
                cells[(r, c)] = _fmt_num(struct.unpack("<d", result)[0])
        elif op == _STRING and pending_formula is not None:
            cells[pending_formula] = _StrCursor([payload]).read_string()
            pending_formula = None

    if not cells:
        return [], []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    grid = [[cells.get((r, c)) for c in range(n_cols)] for r in range(n_rows)]
    header = [h if h is not None else f"_c{i}" for i, h in enumerate(grid[0])]
    return header, grid[1:]


# --------------------------------------------------------------------------
# Writer (inline-LABEL cells; used by exports and the round-trip tests)
# --------------------------------------------------------------------------

def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _biff_string(s: str) -> bytes:
    # cch counts UTF-16 CODE UNITS, not characters: an astral-plane char
    # ('𐀀') is one Python char but two code units — len(s) would make
    # readers cut the string short.
    try:
        raw = s.encode("latin-1")
        return struct.pack("<HB", len(raw), 0) + raw
    except UnicodeEncodeError:
        raw = s.encode("utf-16-le")
        return struct.pack("<HB", len(raw) // 2, 1) + raw


def write_xls(path: str, header: list[str], rows: list[list]) -> None:
    """Write (header, rows) as a single-sheet BIFF8 ``.xls``."""
    sheet = bytearray(_rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0)))
    for rnum, row in enumerate([list(header)] + [list(r) for r in rows]):
        for cnum, val in enumerate(row):
            if val is None:
                continue
            if isinstance(val, bool):
                sheet += _rec(_BOOLERR, struct.pack("<HHHBB", rnum, cnum, 0, int(val), 0))
            elif isinstance(val, (int, float)):
                sheet += _rec(_NUMBER, struct.pack("<HHHd", rnum, cnum, 0, float(val)))
            else:
                sheet += _rec(_LABEL, struct.pack("<HHH", rnum, cnum, 0)
                              + _biff_string(str(val)))
    sheet += _rec(_EOF, b"")

    # BOUNDSHEET carries a SHORT string (cch u8 + flags u8), unlike cells
    name = struct.pack("<BB", 6, 0) + b"Sheet1"
    bof = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    # globals = BOF + BOUNDSHEET + EOF; lbPlyPos points past them
    lb = len(bof) + (4 + 4 + 2 + len(name)) + 4
    globals_ = bof + _rec(_BOUNDSHEET, struct.pack("<IH", lb, 0) + name) + _rec(_EOF, b"")
    assert len(globals_) == lb
    with open(path, "wb") as f:
        f.write(_cfb_container("Workbook", globals_ + bytes(sheet)))

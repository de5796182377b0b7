"""Legacy .xls (BIFF8) codec tests: writer round-trip, hand-built record
streams for the paths the writer doesn't emit (SST + CONTINUE, RK/MULRK,
formula results), and a true mini-stream CFB container (the layout real
Excel uses for any workbook under 4096 bytes)."""

import math
import struct

from sap_data_pipeline_spark.sources import xls as XLS


def test_xls_round_trip(tmp_path):
    p = tmp_path / "dim.xls"
    header = ["Site", "Qty", "Flag", "Note"]
    rows = [
        ["S001", 42, True, "plain"],
        ["S002", 1.5, False, "ünïcode ♞"],   # forces the UTF-16 string path
        ["S003", -7, None, None],
    ]
    XLS.write_xls(str(p), header, rows)
    got_header, got_rows = XLS.read_xls(str(p))
    assert got_header == header
    assert got_rows == [
        ["S001", "42", "True", "plain"],
        ["S002", "1.5", "False", "ünïcode ♞"],
        ["S003", "-7", None, None],
    ]


def test_xls_dim_table_loads(spark, tmp_path):
    from sap_data_pipeline_spark.sources.readers import read_dim_table

    p = tmp_path / "dim.xls"
    XLS.write_xls(str(p), ["Article", "Dept"], [["1234", "D1"], ["5678", "D2"]])
    df = read_dim_table(spark, str(p))
    assert df.columns == ["Article", "Dept"]
    assert {(r["Article"], r["Dept"]) for r in df.collect()} == {
        ("1234", "D1"), ("5678", "D2")
    }


def _sheet_stream(cell_records: bytes) -> bytes:
    bof = XLS._rec(XLS._BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    return bof + cell_records + XLS._rec(XLS._EOF, b"")


def _workbook_stream(globals_extra: bytes, sheet: bytes) -> bytes:
    name = struct.pack("<BB", 6, 0) + b"Sheet1"
    bof = XLS._rec(XLS._BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    lb_fixed = len(bof) + (4 + 4 + 2 + len(name)) + len(globals_extra) + 4
    return (bof
            + XLS._rec(XLS._BOUNDSHEET, struct.pack("<IH", lb_fixed, 0) + name)
            + globals_extra
            + XLS._rec(XLS._EOF, b"")
            + sheet)


def test_xls_sst_split_across_continue(tmp_path):
    """An SST whose character data crosses into a CONTINUE record — the
    continued chunk restates its own flags byte and may switch encoding
    (compressed in the first record, UTF-16 in the continuation)."""
    # string 0: 'abcdef' — 4 chars in SST record, 2 in CONTINUE (compressed)
    # string 1: 'héllo∆' — entirely in CONTINUE, UTF-16
    sst_payload = struct.pack("<II", 2, 2) + struct.pack("<HB", 6, 0) + b"abcd"
    cont_payload = (b"\x00" + b"ef"
                    + struct.pack("<HB", 6, 1) + "héllo∆".encode("utf-16-le"))
    globals_extra = (XLS._rec(XLS._SST, sst_payload)
                     + XLS._rec(XLS._CONTINUE, cont_payload))
    cells = (XLS._rec(XLS._LABELSST, struct.pack("<HHHI", 0, 0, 0, 0))
             + XLS._rec(XLS._LABELSST, struct.pack("<HHHI", 0, 1, 0, 1))
             + XLS._rec(XLS._LABELSST, struct.pack("<HHHI", 1, 0, 0, 1)))
    wb = _workbook_stream(globals_extra, _sheet_stream(cells))
    p = tmp_path / "sst.xls"
    p.write_bytes(XLS._cfb_container("Workbook", wb))
    header, rows = XLS.read_xls(str(p))
    assert header == ["abcdef", "héllo∆"]
    assert rows == [["héllo∆", None]]


def test_xls_rk_mulrk_and_formula_records(tmp_path):
    """RK compressed numbers (int, x100, float), MULRK runs, and cached
    formula results (numeric + string via trailing STRING record)."""
    def rk_int(v: int) -> int:
        return ((v & 0x3FFFFFFF) << 2) | 0x02

    def rk_float(v: float) -> int:
        bits = struct.unpack("<Q", struct.pack("<d", v))[0]
        return (bits >> 32) & 0xFFFFFFFC

    cells = (
        XLS._rec(XLS._RK, struct.pack("<HHHI", 1, 0, 0, rk_int(123)))
        + XLS._rec(XLS._RK, struct.pack("<HHHI", 1, 1, 0, rk_int(-45)))
        + XLS._rec(XLS._RK, struct.pack("<HHHI", 1, 2, 0, rk_int(250) | 0x01))  # /100
        + XLS._rec(XLS._MULRK, struct.pack("<HH", 2, 0)
                   + struct.pack("<HI", 0, rk_float(0.25))
                   + struct.pack("<HI", 0, rk_int(7))
                   + struct.pack("<H", 1))
        + XLS._rec(XLS._FORMULA, struct.pack("<HHHd", 3, 0, 0, 99.0) + b"\x00" * 8)
        + XLS._rec(XLS._FORMULA, struct.pack("<HHH", 3, 1, 0)
                   + b"\x00\x00\x00\x00\x00\x00\xff\xff" + b"\x00" * 8)
        + XLS._rec(XLS._STRING, struct.pack("<HB", 3, 0) + b"fml")
    )
    header_cells = XLS._rec(XLS._LABEL, struct.pack("<HHH", 0, 0, 0)
                            + struct.pack("<HB", 1, 0) + b"H")
    wb = _workbook_stream(b"", _sheet_stream(header_cells + cells))
    p = tmp_path / "rk.xls"
    p.write_bytes(XLS._cfb_container("Workbook", wb))
    _, rows = XLS.read_xls(str(p))
    assert rows[0] == ["123", "-45", "2.5"]
    assert rows[1][:2] == ["0.25", "7"]
    assert rows[2][:2] == ["99", "fml"]


def _mini_cfb(stream_name: str, payload: bytes) -> bytes:
    """CFB container that stores the stream in the MINI-stream (the real
    layout for streams under the 4096 cutoff — what Excel itself writes
    for small dim workbooks)."""
    EOC, FREE, FATS, NOST = (XLS._ENDOFCHAIN, XLS._FREESECT,
                             XLS._FATSECT, XLS._NOSTREAM)
    n_mini = max(1, math.ceil(len(payload) / 64))
    ministream = payload + b"\x00" * (n_mini * 64 - len(payload))
    n_ms_sect = math.ceil(len(ministream) / 512)
    ministream += b"\x00" * (n_ms_sect * 512 - len(ministream))
    # sectors: 0 = FAT, 1 = dir, 2 = miniFAT, 3.. = ministream data
    fat = [FATS, EOC, EOC]
    fat += [4 + i for i in range(n_ms_sect - 1)] + [EOC]
    fat += [FREE] * (128 - len(fat))
    minifat = [i + 1 for i in range(n_mini - 1)] + [EOC]
    minifat += [FREE] * (128 - len(minifat))

    def dirent(name, typ, child, start, size):
        raw = name.encode("utf-16-le")
        return (raw + b"\x00" * (64 - len(raw))
                + struct.pack("<HBB3I", len(raw) + 2, typ, 1, NOST, NOST, child)
                + b"\x00" * 36 + struct.pack("<IQ", start, size))

    d = (dirent("Root Entry", 5, 1, 3, len(ministream))
         + dirent(stream_name, 2, NOST, 0, len(payload))
         + (b"\x00" * 64 + struct.pack("<HBB3I", 0, 0, 0, NOST, NOST, NOST)
            + b"\x00" * 36 + struct.pack("<IQ", 0, 0)) * 2)
    header = bytearray(512)
    header[0:8] = XLS._MAGIC
    struct.pack_into("<HHHHH", header, 24, 0x003E, 0x0003, 0xFFFE, 9, 6)
    struct.pack_into("<9I", header, 40, 0, 1, 1, 0, 4096, 2, 1, EOC, 0)
    struct.pack_into("<109I", header, 76, 0, *([FREE] * 108))
    return (bytes(header) + struct.pack("<128I", *fat) + d
            + struct.pack("<128I", *minifat) + ministream)


def test_xls_ministream_container(tmp_path):
    """A sub-4096-byte Workbook stream stored in the mini-stream must
    read identically — this is the layout of every small real dim."""
    cells = XLS._rec(XLS._LABEL, struct.pack("<HHH", 0, 0, 0)
                     + struct.pack("<HB", 4, 0) + b"Site")
    cells += XLS._rec(XLS._NUMBER, struct.pack("<HHHd", 1, 0, 0, 8.0))
    wb = _workbook_stream(b"", _sheet_stream(cells))
    assert len(wb) < 4096
    p = tmp_path / "mini.xls"
    p.write_bytes(_mini_cfb("Workbook", wb))
    header, rows = XLS.read_xls(str(p))
    assert header == ["Site"]
    assert rows == [["8"]]


def test_xls_round_trip_property():
    """Property: read(write(x)) is the documented string projection of x
    for arbitrary mixed-type content (unicode strings force the UTF-16
    cell path; integral floats collapse to int form)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cell = st.one_of(
        st.none(),
        st.text(max_size=40),
        st.integers(min_value=-10**12, max_value=10**12),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.booleans(),
    )

    def expected(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, int):
            return str(v)
        if isinstance(v, float):
            return str(int(v)) if v.is_integer() and abs(v) < 1e16 else repr(v)
        return v

    @settings(max_examples=60, deadline=None)
    @given(
        header=st.lists(st.text(min_size=1, max_size=20), min_size=1,
                        max_size=6),
        body=st.lists(st.lists(cell, min_size=1, max_size=6), max_size=8),
    )
    def prop(header, body):
        import tempfile

        rows = [r[:len(header)] for r in body]
        with tempfile.NamedTemporaryFile(suffix=".xls") as f:
            XLS.write_xls(f.name, header, rows)
            got_header, got_rows = XLS.read_xls(f.name)
        assert got_header == header
        want = [
            [expected(v) for v in r] + [None] * (len(header) - len(r))
            for r in rows
        ]
        # contract: rows past the last non-empty cell drop (no cell
        # records exist for them — same as trailing blanks in Excel)
        while want and all(v is None for v in want[-1]):
            want.pop()
        assert got_rows == want

    prop()

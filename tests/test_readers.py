"""read_sap_export: banner rows, empty col-0, totals row, string typing."""

from __future__ import annotations

from sap_data_pipeline_spark.sources.readers import read_dim_table, read_sap_export

SAP_FILE = (
    "Dynamic List Display\n"
    "\n"
    "\tSite\tArticle\tQuantity i\n"
    "\t1000\t000123\t1,234.5-\n"
    "\t1001\t456\t99\n"
)

SAP_FILE_TOTALS = SAP_FILE + "\t\t\t1,333.5-\n"


def test_read_sap_export_basic(spark, tmp_path):
    p = tmp_path / "ZMB51_1.txt"
    p.write_text(SAP_FILE)
    df = read_sap_export(spark, str(p))
    assert df.columns[:3] == ["Site", "Article", "Quantity i"]
    rows = sorted(df.select("Site", "Article").collect())
    assert [(r[0], r[1]) for r in rows] == [("1000", "000123"), ("1001", "456")]


def test_read_sap_export_totals_row_dropped(spark, tmp_path):
    p = tmp_path / "ZMMIDR_1.txt"
    p.write_text(SAP_FILE_TOTALS)
    df = read_sap_export(spark, str(p), drop_trailing_totals=True)
    assert df.count() == 2


def test_read_sap_export_multifile(spark, tmp_path):
    (tmp_path / "ZMB51_1.txt").write_text(SAP_FILE)
    (tmp_path / "ZMB51_2.txt").write_text(SAP_FILE)
    df = read_sap_export(spark, str(tmp_path / "ZMB51_*.txt"))
    assert df.count() == 4
    # provenance columns present for keep-last dedup ordering
    assert "_source_file" in df.columns and "_source_line" in df.columns


def test_read_sap_export_header_drift_rejected(spark, tmp_path):
    """Column-order drift between files in one glob must fail loudly —
    splitting all bodies by one arbitrary file's header would silently
    misalign every column of the drifted files."""
    import pytest

    (tmp_path / "Z_1.txt").write_text(SAP_FILE)
    drifted = SAP_FILE.replace("\tSite\tArticle\t", "\tArticle\tSite\t")
    (tmp_path / "Z_2.txt").write_text(drifted)
    with pytest.raises(ValueError, match="header mismatch"):
        read_sap_export(spark, str(tmp_path / "Z_*.txt")).collect()


def test_read_sap_export_empty_fields_null(spark, tmp_path):
    p = tmp_path / "Z.txt"
    p.write_text("x\n\n\tA\tB\n\t\tv\n")
    row = read_sap_export(spark, str(p)).collect()[0]
    assert row["A"] is None and row["B"] == "v"


def test_read_dim_table_csv(spark, tmp_path):
    """Dim loader: driver-side pandas → all-string DataFrame; totals row
    dropped; empty cells become NULL."""
    p = tmp_path / "dim_store.csv"
    p.write_text("Site,Name,Qty\n0001,Store A,5\n0002,,7\nTotal,,12\n")
    df = read_dim_table(spark, str(p), drop_trailing_totals=True)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 3
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["Site"] == "0001" and rows[1]["Name"] is None


def test_xlsx_round_trip(spark, tmp_path):
    """export_excel → read_dim_table round-trips strings, numbers, NULLs,
    and XML-special characters through the stdlib SpreadsheetML codec."""
    from sap_data_pipeline_spark.sources.sinks import export_excel

    df = spark.createDataFrame(
        [("A&B <tag>", 1.5, "x"), ("plain", 2.0, None), ("третий", -3.25, "z")],
        "Name string, Val double, Note string",
    )
    p = tmp_path / "dim.xlsx"
    n = export_excel(df, str(p))
    assert n == 3

    back = read_dim_table(spark, str(p))
    assert back.columns == ["Name", "Val", "Note"]
    rows = {r["Name"]: r for r in back.collect()}
    assert rows["A&B <tag>"]["Val"] == "1.5"     # dims read as strings
    assert rows["plain"]["Note"] is None          # empty cell → NULL
    assert "третий" in rows                       # non-ASCII survives


def test_xlsx_reader_shared_strings_and_sparse_cells(spark, tmp_path):
    """Reader handles the sharedStrings layout other writers produce, and
    sparse rows where cells are addressed only by reference."""
    import zipfile

    from sap_data_pipeline_spark.sources import xlsx as XL

    ss = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<si><t>Code</t></si><si><t>Desc</t></si>"
        "<si><r><t>rich </t></r><r><t>text</t></r></si>"
        "</sst>"
    )
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2"><v>42</v></c><c r="B2" t="s"><v>2</v></c></row>'
        '<row r="3"><c r="B3"><v>7</v></c></row>'  # A3 absent → None
        "</sheetData></worksheet>"
    )
    p = tmp_path / "ext.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", XL._CONTENT_TYPES)
        z.writestr("_rels/.rels", XL._ROOT_RELS)
        z.writestr("xl/workbook.xml", XL._WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", XL._WORKBOOK_RELS)
        z.writestr("xl/sharedStrings.xml", ss)
        z.writestr("xl/worksheets/sheet1.xml", sheet)

    header, rows = XL.read_xlsx(str(p))
    assert header == ["Code", "Desc"]
    assert rows == [["42", "rich text"], [None, "7"]]

    df = read_dim_table(spark, str(p))
    assert df.count() == 2 and df.columns == ["Code", "Desc"]


def test_read_jsonl_corpus_quarantines_bad_lines(spark, tmp_path):
    """Malformed JSONL lines route to the quarantine frame with their
    source file; parseable lines with missing fields load with NULLs."""
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.sources.readers import read_jsonl_corpus

    p = tmp_path / "dump.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good doc"}\n'
        '{"doc_id": 2, "text": "another", "extra": "ignored"}\n'
        'this is not json at all\n'
        '{"doc_id": 3}\n'                       # missing text → NULL, not quarantine
        '\n'                                    # blank line → quarantine, not NULL row
        '   \n'                                 # whitespace-only → quarantine too
        '{"doc_id": 4, "text": "trailing garbage"} }{\n'
    )
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    clean, quarantine = read_jsonl_corpus(spark, str(p), schema)
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert rows[1] == "good doc" and rows[2] == "another"
    assert 3 in rows and rows[3] is None
    assert len(rows) == 4, "blank lines must not land in clean as all-NULL rows"
    bad = quarantine.collect()
    assert len(bad) + len(rows) == 7
    assert all("dump.jsonl" in r["_source_file"] for r in bad)
    assert any("not json" in r["raw_line"] for r in bad)
    assert sum(1 for r in bad if r["raw_line"].strip() == "") == 2


def test_xlsx_reader_first_sheet_by_workbook_order_and_rless_cells(tmp_path):
    """Sheet resolution must follow workbook.xml order (lexicographic
    part sort puts sheet10.xml before sheet2.xml); cells without an r=
    attribute occupy the running column, not column A."""
    import zipfile

    from sap_data_pipeline_spark.sources import xlsx as XL

    ws = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>{rows}</sheetData></worksheet>"
    )
    # active sheet: header row uses r=; data row has NO r= attributes
    right = ws.format(rows=(
        '<row r="1"><c r="A1" t="inlineStr"><is><t>H1</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>H2</t></is></c></row>'
        '<row r="2"><c t="inlineStr"><is><t>x</t></is></c>'
        "<c><v>42</v></c></row>"
    ))
    wrong = ws.format(rows='<row r="1"><c r="A1"><v>999</v></c></row>')
    content_types = (
        '<?xml version="1.0"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/></Types>'
    )
    workbook = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Active" sheetId="1" r:id="rId7"/>'
        '<sheet name="Other" sheetId="2" r:id="rId8"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId7" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>'
        '<Relationship Id="rId8" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet10.xml"/>'
        "</Relationships>"
    )
    p = tmp_path / "multi.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet10.xml", wrong)   # lexicographically first
        z.writestr("xl/worksheets/sheet2.xml", right)    # workbook-first
    header, rows = XL.read_xlsx(str(p))
    assert header == ["H1", "H2"]
    assert rows == [["x", "42"]]


def test_xlsx_writer_strips_illegal_control_chars(spark, tmp_path):
    """A stray control byte (common in scraped text) must not make the
    workbook unparseable — stripped like openpyxl does."""
    from sap_data_pipeline_spark.sources import xlsx as XL

    p = tmp_path / "ctl.xlsx"
    XL.write_xlsx(str(p), ["Name"], [["bad\x00byte\x1bhere"], ["tab\tand\nnewline ok"]])
    header, rows = XL.read_xlsx(str(p))
    assert rows[0][0] == "badbytehere"
    assert rows[1][0] == "tab\tand\nnewline ok"


def test_warc_reader_from_files(spark, tmp_path):
    """read_warc_corpus over real .warc and .warc.gz files on disk:
    binaryFile scan -> record explosion; warcinfo records skipped by
    type filter; bodies and URIs round-trip exactly."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.sources import warc as W

    recs1 = [("http://a.example/1", "hello warc world"),
             ("http://a.example/2", "second document body")]
    recs2 = [("http://b.example/3", "gzipped member record")]
    (tmp_path / "f1.warc").write_bytes(W.build_warc_bytes(recs1))
    (tmp_path / "f2.warc.gz").write_bytes(
        W.build_warc_bytes(recs2, gzip_members=True))

    out = W.read_warc_corpus(spark, str(tmp_path)).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r["record_type"], []).append(r)
    assert len(by_type["warcinfo"]) == 2          # one per file, passed through
    responses = {r["target_uri"]: r for r in by_type["response"]}
    assert set(responses) == {"http://a.example/1", "http://a.example/2",
                              "http://b.example/3"}
    assert responses["http://a.example/1"]["body"] == "hello warc world"
    assert responses["http://b.example/3"]["body"] == "gzipped member record"
    assert all(r["http_status"] == 200 for r in by_type["response"])
    assert all(r["content_type"] == "text/plain; charset=utf-8"
               for r in by_type["response"])


def test_warc_parse_rejects_truncated_gzip():
    import pytest

    from sap_data_pipeline_spark.sources import warc as W

    payload = W.build_warc_bytes([("http://x/1", "body")], gzip_members=True)
    with pytest.raises(ValueError, match="truncated"):
        W.parse_warc_records(payload[:-10])


def test_warc_parse_body_with_crlf_sequences():
    """Record walking is Content-Length-driven: a body containing
    \\r\\n\\r\\n (the header terminator) must NOT split the record."""
    from sap_data_pipeline_spark.sources import warc as W

    tricky = "line one\r\n\r\nWARC/1.0 fake marker\r\n\r\nline two"
    recs = W.parse_warc_records(
        W.build_warc_bytes([("http://x/1", tricky)]))
    responses = [r for r in recs if r["record_type"] == "response"]
    assert len(responses) == 1
    assert responses[0]["body"] == tricky


def test_warc_roundtrip_property():
    """Property: build→parse is identity for ANY body text (unicode,
    embedded CRLF/header-terminator sequences, empty), with and without
    per-record gzip members."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sap_data_pipeline_spark.sources import warc as W

    body = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
    )

    @settings(max_examples=50, deadline=None)
    @given(bodies=st.lists(body, min_size=1, max_size=5), gz=st.booleans())
    def check(bodies, gz):
        recs = [(f"http://x.example/{i}", b) for i, b in enumerate(bodies)]
        parsed = W.parse_warc_records(W.build_warc_bytes(recs, gzip_members=gz))
        responses = [r for r in parsed if r["record_type"] == "response"]
        assert [r["body"] for r in responses] == list(bodies)
        assert [r["target_uri"] for r in responses] == [u for u, _ in recs]
        assert parsed[0]["record_type"] == "warcinfo"

    check()


def test_export_jsonl_sharded_roundtrip(spark, tmp_path, star):
    """Curated corpus -> sharded JSONL -> read_jsonl_corpus: lossless
    round-trip through our own front door, deterministic shard layout."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.sources.readers import read_jsonl_corpus
    from sap_data_pipeline_spark.sources.sinks import export_jsonl_sharded

    docs = star.documents.filter(F.col("doc_id") < 100).select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "shards")
    n = export_jsonl_sharded(docs, out, docs_per_shard=16, order_key="doc_id")
    assert n == docs.count()

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    clean, quarantine = read_jsonl_corpus(spark, out, schema)
    assert quarantine.count() == 0
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in clean.collect()}
    want = {r["doc_id"]: (r["text"], r["lang"]) for r in docs.collect()}
    assert got == want

    # determinism: re-export produces byte-identical shard contents
    import hashlib
    from pathlib import Path

    def digest(p):
        parts = sorted(f.read_bytes() for f in Path(p).glob("part-*"))
        return hashlib.md5(b"".join(parts)).hexdigest()

    out2 = str(tmp_path / "shards2")
    export_jsonl_sharded(docs, out2, docs_per_shard=16, order_key="doc_id")
    assert digest(out) == digest(out2)


def test_read_parquet_evolving_contracts_to_target(spark, tmp_path):
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.sources.readers import read_parquet_evolving

    root = str(tmp_path / "evolving")
    # generation 1: (k int, v int) — no `extra`, narrow int
    spark.createDataFrame([(1, 10)], "k int, v int").write.parquet(root + "/gen1")
    # generation 2: adds `note`, widens v to long
    spark.createDataFrame(
        [(2, 20_000_000_000, "late")], "k int, v long, note string"
    ).write.parquet(root + "/gen2")

    target = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.LongType()),
        T.StructField("note", T.StringType()),
        T.StructField("added_later", T.DoubleType()),
    ])
    got = {r["k"]: r for r in read_parquet_evolving(
        spark, root, target_schema=target
    ).collect()}
    assert [f.dataType.simpleString() for f in
            read_parquet_evolving(spark, root, target_schema=target).schema.fields
            ] == ["int", "bigint", "string", "double"]
    assert got[1]["v"] == 10 and got[1]["note"] is None and got[1]["added_later"] is None
    assert got[2]["v"] == 20_000_000_000 and got[2]["note"] == "late"


def test_read_parquet_evolving_rejects_narrowing(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.sources.readers import read_parquet_evolving

    root = str(tmp_path / "evonarrow")
    spark.createDataFrame([(1, 20_000_000_000)], "k int, v long").write.parquet(root)
    target = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.IntegerType()),  # long -> int would truncate
    ])
    with pytest.raises(ValueError, match="narrowing"):
        read_parquet_evolving(spark, root, target_schema=target)


def test_read_parquet_evolving_decimal_widening_and_guards(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.sources.readers import read_parquet_evolving

    root = str(tmp_path / "evodec")
    spark.sql("SELECT CAST(1.25 AS DECIMAL(10,2)) AS v").write.parquet(root)
    # decimal widening accepted
    wide = T.StructType([T.StructField("v", T.DecimalType(18, 6))])
    assert [f.dataType.simpleString() for f in
            read_parquet_evolving(spark, root, target_schema=wide).schema.fields
            ] == ["decimal(18,6)"]
    # decimal narrowing (fewer integral digits) rejected
    narrow = T.StructType([T.StructField("v", T.DecimalType(4, 2))])
    with pytest.raises(ValueError, match="narrowing"):
        read_parquet_evolving(spark, root, target_schema=narrow)
    # int → decimal without room for 10 digits rejected
    root2 = str(tmp_path / "evoint")
    spark.createDataFrame([(2147483647,)], "v int").write.parquet(root2)
    small = T.StructType([T.StructField("v", T.DecimalType(5, 0))])
    with pytest.raises(ValueError, match="narrowing"):
        read_parquet_evolving(spark, root2, target_schema=small)
    # hive-partitioned layout rejected (footers lack the partition col)
    root3 = str(tmp_path / "evopart")
    spark.createDataFrame([(1, "a")], "k int, dt string").write.partitionBy(
        "dt").parquet(root3)
    tgt = T.StructType([T.StructField("k", T.IntegerType()),
                        T.StructField("dt", T.StringType())])
    with pytest.raises(ValueError, match="partition"):
        read_parquet_evolving(spark, root3, target_schema=tgt)


def test_read_parquet_evolving_rejects_bigint_to_double(spark, tmp_path):
    """bigint -> double is LOSSY above 2^53 (53 mantissa bits) — the
    evolving reader's no-silent-truncation guarantee must reject it,
    while the exact int -> double widening stays allowed."""
    import pytest
    from pyspark.sql import types as T

    from sap_data_pipeline_spark.sources.readers import read_parquet_evolving

    root = str(tmp_path / "evolossy")
    spark.createDataFrame(
        [(1, (1 << 53) + 1)], "k int, v long"
    ).write.parquet(root)
    target = T.StructType([
        T.StructField("k", T.DoubleType()),   # int -> double: exact, OK
        T.StructField("v", T.DoubleType()),   # bigint -> double: lossy
    ])
    with pytest.raises(ValueError, match="narrowing|incompatible"):
        read_parquet_evolving(spark, root, target_schema=target)


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC sink/source round trip; predicate reaches the ORC scan as a
    pushed filter (stripe-statistics skipping at scale)."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.sources.sinks import export_orc, read_orc

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    path = str(tmp_path / "t.orc")
    export_orc(df, path)
    back = read_orc(spark, path)
    assert back.count() == 1000
    assert {r["v"] for r in back.filter(F.col("v") == 3).collect()} == {3}
    plan = back.filter(F.col("k") > 990)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "GreaterThan(k,990" in plan


def test_write_epoch_shards_ordered_roundtrip(spark, tmp_path):
    """The epoch-shard sink writes one ordered parquet dir per shard;
    reading a shard back WITHOUT sorting replays its epoch order
    (parquet preserves in-file row order), and the union of shards is
    the full corpus."""
    import glob as _glob

    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.sources.sinks import write_epoch_shards

    df = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    target = str(tmp_path / "epoch0")
    n = write_epoch_shards(df, "doc_id", target, epoch=1, n_shards=4)
    assert n == 300

    shard_dirs = sorted(_glob.glob(f"{target}/shard=*"))
    assert len(shard_dirs) == 4
    # one task per shard -> one data file per shard directory
    for d in shard_dirs:
        files = [f for f in _glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, files

    # in-file order == epoch order: read one shard WITHOUT sorting and
    # compare against the pos_in_shard column it carries
    back = spark.read.parquet(shard_dirs[0]).toPandas()
    assert list(back["pos_in_shard"]) == sorted(back["pos_in_shard"])

    # the union of shards is exactly the corpus
    all_back = spark.read.parquet(target)
    assert all_back.count() == 300
    assert all_back.select("doc_id").distinct().count() == 300


def test_write_epoch_shards_empty_input_returns_zero(spark, tmp_path):
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.sources.sinks import write_epoch_shards

    empty = spark.range(0).select(F.col("id").alias("doc_id"))
    assert write_epoch_shards(empty, "doc_id", str(tmp_path / "e")) == 0

"""Unit tests for the round-13 operators: robots Sitemap discovery,
RFC 3986 percent-encoding normalization, crawler-trap detection.
(The audio near-dup arm lives in test_audio_dedup.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# robots_sitemap_urls
# ---------------------------------------------------------------------------

def test_robots_sitemap_urls_group_independent(spark):
    """Sitemap: is valid anywhere — inside a foreign UA group, before
    any group, mixed case; duplicates dedup; the rules parser must
    keep SKIPPING these lines."""
    from sap_data_pipeline_spark.operators.corpus import (
        parse_robots_txt,
        robots_sitemap_urls,
    )

    body = "\n".join([
        "Sitemap: https://h1/top.xml",       # before any group
        "User-agent: googlebot",
        "Disallow: /g",
        "Sitemap: https://h1/inner.xml",     # inside a foreign group
        "User-agent: *",
        "Disallow: /x",
        "SITEMAP: https://h1/top.xml",       # duplicate, different case
        "sitemap:   https://h1/ws.xml   # c",  # whitespace + comment
        "Sitemap:",                           # empty value: skipped
    ])
    df = spark.createDataFrame([("h1", body)],
                               "host string, robots_txt string")
    got = sorted(r["sitemap_url"] for r in robots_sitemap_urls(df).collect())
    assert got == ["https://h1/inner.xml", "https://h1/top.xml",
                   "https://h1/ws.xml"]
    # the rules parser still ignores every Sitemap line
    rules = parse_robots_txt(df).collect()
    assert all(r["path_prefix"] in (None, "/x") for r in rules)


# ---------------------------------------------------------------------------
# percent_normalize_url
# ---------------------------------------------------------------------------

def test_percent_normalize_rfc3986(spark):
    """§6.2.2.1 uppercase hex; §6.2.2.2 decode unreserved only;
    malformed '%' verbatim; reserved octets stay encoded."""
    from sap_data_pipeline_spark.functions.text import percent_normalize_url

    rows = [
        ("https://h/a%2fb", "https://h/a%2Fb"),        # reserved '/': case up
        ("https://h/%41%7e", "https://h/A~"),          # unreserved: decode
        ("https://h/%2E%2e", "https://h/.."),
        ("https://h/plain", "https://h/plain"),
        ("https://h/bad%4%zz", "https://h/bad%4%zz"),  # malformed verbatim
        ("https://h/%20%2f", "https://h/%20%2F"),      # space+slash encoded
        ("100% legit", "100% legit"),                  # bare % verbatim
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "u string")
    got = [r[0] for r in df.select(percent_normalize_url("u")).collect()]
    assert got == [e for _, e in rows]


def test_percent_normalize_join_parity(spark):
    """The design point: equivalent spellings become join-equal."""
    from sap_data_pipeline_spark.functions.text import percent_normalize_url

    df = spark.createDataFrame(
        [("https://h/%7euser",), ("https://h/%7Euser",),
         ("https://h/~user",)], "u string",
    )
    n = df.select(percent_normalize_url("u").alias("n")).distinct().count()
    assert n == 1


# ---------------------------------------------------------------------------
# url_trap_signals
# ---------------------------------------------------------------------------

def test_url_trap_signals_battery(spark):
    from sap_data_pipeline_spark.operators.corpus import url_trap_signals

    urls = [
        ("https://h/a/b/a/b/a",),                       # repeat loop
        ("https://h/p/q",),                             # clean
        ("https://h/" + "/".join(f"d{i}" for i in range(13)),),  # deep
        ("https://h/p?s=0123456789abcdef0",),           # session id
        ("https://h/blog/2024/3/15/x",),                # calendar
        ("https://h/" + "x" * 600,),                    # long
        ("//h/a/b/a/b/a",),                             # protocol-relative
    ]
    got = {r["url"]: r for r in
           url_trap_signals(spark.createDataFrame(urls, "url string"))
           .collect()}
    assert got["https://h/a/b/a/b/a"]["repeat_trap"] is True
    assert got["https://h/a/b/a/b/a"]["seg_repeats"] == 3
    assert got["https://h/p/q"]["is_trap"] is False
    deep = "https://h/" + "/".join(f"d{i}" for i in range(13))
    assert got[deep]["too_deep"] is True and got[deep]["depth"] == 13
    assert got["https://h/p?s=0123456789abcdef0"]["session_id"] is True
    assert got["https://h/blog/2024/3/15/x"]["calendar"] is True
    assert got["https://h/" + "x" * 600]["too_long"] is True
    assert got["//h/a/b/a/b/a"]["repeat_trap"] is True  # bare-host parse
    # one signal per fixture row: no cross-contamination
    assert got["https://h/blog/2024/3/15/x"]["repeat_trap"] is False


def test_url_trap_signals_is_projection_only(spark):
    from sap_data_pipeline_spark.operators.corpus import url_trap_signals

    df = spark.createDataFrame([("https://h/a",)], "url string")
    plan = url_trap_signals(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# global_line_keep_first
# ---------------------------------------------------------------------------

def test_global_line_keep_first_cross_doc(spark):
    """The globally FIRST occurrence (by doc, then line index) wins;
    later docs lose their copies; blank lines are exempt."""
    from sap_data_pipeline_spark.operators.corpus import global_line_keep_first

    df = spark.createDataFrame(
        [(1, "alpha\n\nbeta"),
         (2, "beta\nalpha\ngamma"),   # both dupes drop, gamma survives
         (3, "\ngamma\nalpha")],      # blank kept, rest drop
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in global_line_keep_first(df).collect()}
    assert got[1]["cleaned_text"] == "alpha\n\nbeta"
    assert got[1]["n_dropped_dupes"] == 0
    assert got[2]["cleaned_text"] == "gamma"
    assert got[2]["n_dropped_dupes"] == 2
    assert got[3]["cleaned_text"] == ""   # blank line kept: '' joins to ''
    assert got[3]["n_kept"] == 1 and got[3]["n_dropped_dupes"] == 2


# ---------------------------------------------------------------------------
# video_scene_cuts
# ---------------------------------------------------------------------------

def _y4m(frames_luma, w, h):
    parts = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
    for lv in frames_luma:
        parts.append(b"FRAME\n" + bytes([lv] * (w * h))
                     + bytes([128] * (w * h // 2)))
    return b"".join(parts)


def test_video_scene_cuts_hand_computed(spark):
    """Two flat 4x2 frames at luma 10 then 110: diff = 8·100 = 800,
    denom = 8·255; 100·800 > 10·2040 -> cut.  A 10->12 step is not."""
    from sap_data_pipeline_spark.operators.multimodal import video_scene_cuts

    media = spark.createDataFrame(
        [(1, bytearray(_y4m([10, 110, 112], 4, 2)))],
        "media_id long, payload binary",
    )
    got = {r["frame_idx"]: r for r in video_scene_cuts(media).collect()}
    assert got[0]["diff"] == 800 and got[0]["is_cut"] is True
    assert got[1]["diff"] == 16 and got[1]["is_cut"] is False


def test_video_scene_cuts_corrupt_degrades(spark):
    """Non-Y4M payloads emit one all-NULL transition row (per-row
    degrade contract); single-frame clips emit none."""
    from sap_data_pipeline_spark.operators.multimodal import video_scene_cuts

    media = spark.createDataFrame(
        [(1, bytearray(b"not a video")), (2, bytearray(_y4m([50], 4, 2)))],
        "media_id long, payload binary",
    )
    rows = video_scene_cuts(media).collect()
    assert len(rows) == 1
    [r] = rows
    assert r["media_id"] == 1 and r["frame_idx"] is None \
        and r["diff"] is None and r["is_cut"] is None


# ---------------------------------------------------------------------------
# minhash_estimate_audit
# ---------------------------------------------------------------------------

def test_minhash_estimate_audit_identical_docs(spark):
    """Identical docs: estimate 1.0, exact 1.0, error 0; a disjoint doc
    pairs with neither."""
    from sap_data_pipeline_spark.operators.dedup import minhash_estimate_audit

    text = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different words everywhere nothing shared at all ok"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, other)], "doc_id long, text string"
    )
    rows = minhash_estimate_audit(df).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["est_jaccard"] == 1.0 and r["exact_jaccard"] == 1.0
    assert r["abs_err"] == 0.0


def test_minhash_estimate_audit_partial_overlap(spark):
    """A half-overlapping pair: exact Jaccard is the true shingle ratio
    and the estimate is k/8 for integer k — the audit surfaces the
    quantization error an 8-perm signature carries."""
    from sap_data_pipeline_spark.operators.dedup import minhash_estimate_audit

    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "alpha beta gamma delta epsilon zeta iota kappa"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    rows = minhash_estimate_audit(df).collect()
    if rows:  # pair surfaces only if some band agrees
        [r] = rows
        assert 0.0 < r["exact_jaccard"] < 1.0
        assert r["est_jaccard"] * 8 == int(r["est_jaccard"] * 8)
        assert r["abs_err"] == round(
            abs(r["est_jaccard"] - r["exact_jaccard"]), 6
        )


# ---------------------------------------------------------------------------
# hashed_gram_buckets production (xxhash64) path
# ---------------------------------------------------------------------------

def test_hashed_ngram_production_path(spark):
    """The xxhash64 production path shares everything but the hash with
    the md5 oracle twin: same grams (count + order), same pmod bucket
    arithmetic.  With n_buckets=1 every hash collapses to bucket 0, so
    the two paths must be EXACTLY equal — pinning the hash-independent
    pipeline; with n_buckets=64 the production buckets must match a
    direct F.xxhash64 evaluation gram for gram."""
    from sap_data_pipeline_spark.functions import text as X

    df = spark.createDataFrame(
        [("the quick brown fox",), ("one",), ("",)], ["text"]
    )
    both = df.select(
        X.hashed_gram_buckets(X.tokens("text"), n_buckets=1, seed=5)
        .alias("md5_b1"),
        X.hashed_gram_buckets(X.tokens("text"), n_buckets=1, seed=5,
                              production=True).alias("xx_b1"),
        X.hashed_gram_buckets(X.tokens("text"), n_buckets=64, seed=5,
                              production=True).alias("xx_b64"),
    ).collect()
    for r in both:
        assert r["md5_b1"] == r["xx_b1"]          # identical gram pipeline
        assert len(r["xx_b64"]) == len(r["md5_b1"])
        assert all(0 <= b < 64 for b in r["xx_b64"])
    # direct gram-for-gram check against F.xxhash64 itself
    toks = ["the", "quick", "brown", "fox"]
    grams = toks + ["the quick", "quick brown", "brown fox"]
    gdf = spark.createDataFrame([(g,) for g in grams], ["g"])
    expect = [
        r[0] % 64 if r[0] % 64 >= 0 else r[0] % 64
        for r in gdf.select(F.xxhash64(F.lit(5), F.col("g"))).collect()
    ]
    assert both[0]["xx_b64"] == expect


def test_hashed_linear_score_production_equivalence_b1(spark):
    """End-to-end: with n_buckets=1 the score is weights[0] regardless
    of hash path — the fold arithmetic is pinned hash-independent."""
    from sap_data_pipeline_spark.functions import text as X

    df = spark.createDataFrame([("alpha beta gamma",)], ["text"])
    toks = X.tokens("text")
    [r] = df.select(
        X.hashed_linear_score_from(
            X.hashed_gram_buckets(toks, n_buckets=1, seed=5), [0.25]
        ).alias("md5_s"),
        X.hashed_linear_score_from(
            X.hashed_gram_buckets(toks, n_buckets=1, seed=5,
                                  production=True), [0.25]
        ).alias("xx_s"),
    ).collect()
    assert r["md5_s"] == r["xx_s"] == 0.25


# ---------------------------------------------------------------------------
# robots_disallow_gate_fold (the A/B variant)
# ---------------------------------------------------------------------------

def test_robots_gate_fold_matches_window_variant(spark):
    """The map-side fold variant must agree with the window variant bit
    for bit — same precedence, same wildcard translation, same
    distinct-URL output — on the full wildcard battery plus duplicate
    frontier URLs and a rule-less host."""
    from sap_data_pipeline_spark.operators.corpus import (
        robots_disallow_gate,
        robots_disallow_gate_fold,
    )

    rules = spark.createDataFrame(
        [("h1", p, a) for (p, a) in
         [("/a", False), ("/a/pub", True), ("/dup", True), ("/dup", False),
          ("/*/w", False), ("/a/x*", True), ("/a$", True),
          ("/d*p/z", False), ("/dup/*", True)]],
        "host string, path_prefix string, allow boolean",
    )
    urls = [("https://h1/a/x1",), ("https://h1/a/pub/y",),
            ("//h1/dup/z",), ("//h1/dup/z",), ("h1/free/w",),
            ("https://h1/a",), ("https://nobody/q",), ("https://h1/q",)]
    frontier = spark.createDataFrame(urls, "url string")
    w = {r["url"]: (r["matched_prefix"], r["allowed"], r["host"], r["path"])
         for r in robots_disallow_gate(frontier, rules).collect()}
    f = {r["url"]: (r["matched_prefix"], r["allowed"], r["host"], r["path"])
         for r in robots_disallow_gate_fold(frontier, rules).collect()}
    assert w == f
    assert len(f) == 7  # duplicate URL collapsed by both


# ---------------------------------------------------------------------------
# sitemap_index_extract
# ---------------------------------------------------------------------------

def test_sitemap_index_extract_grammar(spark):
    """<sitemap> blocks only (a <url> urlset block is ignored),
    loc-less blocks skipped, entity locs decoded, CDATA verbatim,
    lastmod cut to the ISO date."""
    from sap_data_pipeline_spark.operators.corpus import (
        sitemap_index_extract,
    )

    xml = (
        '<sitemapindex>'
        '<sitemap><loc>https://h/a.xml</loc>'
        '<lastmod>2024-03-01T12:00:00+00:00</lastmod></sitemap>'
        '<SITEMAP><loc> https://h/b.xml?p=1&amp;q=2 </loc></SITEMAP>'
        '<sitemap><loc><![CDATA[https://h/c?x=1&y=2&amp;z]]></loc></sitemap>'
        '<sitemap><lastmod>2024-01-01</lastmod></sitemap>'
        '<url><loc>https://h/not-index</loc></url>'
        '</sitemapindex>'
    )
    df = spark.createDataFrame([("h", xml)], "host string, sitemap_xml string")
    got = {
        r["sitemap_url"]: r["lastmod"]
        for r in sitemap_index_extract(df).collect()
    }
    assert got == {
        "https://h/a.xml": "2024-03-01",
        "https://h/b.xml?p=1&q=2": None,
        "https://h/c?x=1&y=2&amp;z": None,
    }


# ---------------------------------------------------------------------------
# http_revalidation_plan
# ---------------------------------------------------------------------------

def _reval(spark, rows, now):
    from sap_data_pipeline_spark.operators.temporal import (
        http_revalidation_plan,
    )

    df = spark.createDataFrame(
        rows,
        "url string, fetched_at long, etag string, last_modified string, "
        "cache_control string, expires string, date string",
    )
    return {
        r["url"]: r for r in http_revalidation_plan(df, now=now).collect()
    }


def test_revalidation_freshness_ladder(spark):
    """Each rung of the RFC 9111 ladder: no-cache beats a co-present
    max-age, quoted max-age parses, Expires−Date clamps at 0, the 10%
    heuristic caps at 24h, x-max-age never matches the token."""
    D0 = "Tue, 14 Nov 2023 22:13:20 GMT"       # 1700000000
    LM = "Tue, 14 Nov 2023 19:26:40 GMT"       # 1699990000 (10k earlier)
    EXP_PAST = "Tue, 14 Nov 2023 22:00:00 GMT"  # before D0
    rows = [
        ("u1", 1700000000, None, None, 'private, max-age="500"', None, None),
        ("u2", 1700000000, '"e"', LM, "no-cache, max-age=500", None, None),
        ("u3", 1700000000, None, None, None, EXP_PAST, D0),
        ("u4", 1700000000, None, LM, None, None, D0),       # 10k/10 = 1000
        ("u5", 1700000000, None, "Thu, 01 Jan 1970 00:00:00 GMT",
         None, None, D0),                                    # heuristic cap
        ("u6", 1700000000, None, LM, "x-max-age=5", None, D0),  # trap token
    ]
    got = _reval(spark, rows, now=1700000100)
    assert got["u1"]["freshness_lifetime_sec"] == 500
    assert got["u1"]["is_fresh"] and got["u1"]["mode"] == "fresh"
    assert got["u2"]["freshness_lifetime_sec"] == 0
    assert got["u2"]["mode"] == "if-none-match"
    assert got["u3"]["freshness_lifetime_sec"] == 0
    assert got["u3"]["mode"] == "unconditional"
    assert got["u4"]["freshness_lifetime_sec"] == 1000
    assert got["u4"]["fresh_until"] == 1700001000
    assert got["u5"]["freshness_lifetime_sec"] == 86400
    assert got["u6"]["freshness_lifetime_sec"] == 1000  # ladder fell through


def test_revalidation_precedence_and_degrade(spark):
    """no-store forces unconditional past a stored ETag; ETag beats
    Last-Modified; malformed dates degrade to the next rung."""
    LM = "Tue, 14 Nov 2023 19:26:40 GMT"
    rows = [
        ("u1", 1700000000, '"e"', LM, "no-store", None, None),
        ("u2", 1700000000, '"e"', LM, "max-age=0", None, None),
        ("u3", 1700000000, None, "garbage", "max-age=0", None, None),
        ("u4", 1700000000, None, "garbage", None, None,
         "Tue, 14 Nov 2023 22:13:20 GMT"),  # lm unparseable -> lifetime 0
    ]
    got = _reval(spark, rows, now=1700000100)
    assert got["u1"]["mode"] == "unconditional"
    assert got["u2"]["mode"] == "if-none-match"
    assert got["u3"]["mode"] == "unconditional"
    assert got["u4"]["freshness_lifetime_sec"] == 0
    assert got["u4"]["mode"] == "unconditional"


# ---------------------------------------------------------------------------
# charset_sniff
# ---------------------------------------------------------------------------

def test_charset_sniff_battery(spark):
    """BOM beats meta, utf-32le beats the utf-16le BOM it contains,
    meta past the 1024-byte prescan window and charset= outside a meta
    are both ignored, NULL payload degrades to all-NULL."""
    from sap_data_pipeline_spark.operators.multimodal import charset_sniff

    rows = [
        (0, b"\xef\xbb\xbf<meta charset='koi8-r'>"),
        (1, b"\xff\xfeab"),
        (2, b"\xff\xfe\x00\x00ab"),
        (3, b"<META Charset = 'Shift_JIS' >x"),
        (4, b'<meta http-equiv="Content-Type" '
            b'content="text/html;charset=ISO-8859-7">'),
        (5, b"<p>charset=evil</p>" + b" " * 1100 + b'<meta charset="utf-8">'),
        (6, b"caf\xe9"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in charset_sniff(df).collect()}
    assert got[0]["charset"] == "utf-8"
    assert got[0]["meta_charset"] == "koi8-r"   # conflict stays visible
    assert got[1]["charset"] == "utf-16le"
    assert got[2]["charset"] == "utf-32le"
    assert got[3]["charset"] == "shift_jis"
    assert got[4]["charset"] == "iso-8859-7"
    assert got[5]["charset"] == "us-ascii"
    assert got[5]["meta_charset"] is None
    assert got[6]["charset"] == "windows-1252"
    assert got[7]["charset"] is None and got[7]["bom_charset"] is None


# ---------------------------------------------------------------------------
# parse_http_response_head
# ---------------------------------------------------------------------------

def test_http_head_parse_grammar(spark):
    """Status line, obs-fold unfolding, first-wins singles, comma-join
    Cache-Control, line-anchored names, malformed degrade."""
    from sap_data_pipeline_spark.operators.temporal import (
        parse_http_response_head,
    )

    head = (
        "HTTP/1.1 200 OK\r\n"
        "Date: Tue, 14 Nov 2023 22:13:20 GMT\r\n"
        "Date: Wed, 15 Nov 2023 00:00:00 GMT\r\n"      # dup: first wins
        "Cache-Control: public\r\n"
        "Cache-Control: max-age=60\r\n"                 # dup: comma-join
        "Last-Modified: Tue, 14\r\n"
        " Nov 2023 20:00:00 GMT\r\n"                    # obs-fold
        'Content-Type: Text/HTML; charset="UTF-8"\r\n'
        "X-Note: Date: not a date header\r\n"           # value, not field
        "Content-Length: 123\r\n"
    )
    df = spark.createDataFrame([("u", head)], "url string, raw_head string")
    r = parse_http_response_head(df).first()
    assert r["status_code"] == 200 and r["reason"] == "OK"
    assert r["date"] == "Tue, 14 Nov 2023 22:13:20 GMT"
    assert r["cache_control"] == "public, max-age=60"
    assert r["last_modified"] == "Tue, 14 Nov 2023 20:00:00 GMT"
    assert r["content_type"] == "text/html" and r["charset"] == "utf-8"
    assert r["content_length"] == 123

    bad = spark.createDataFrame(
        [("u", "ICY 200 OK\r\nContent-Length: junk\r\n")],
        "url string, raw_head string",
    )
    b = parse_http_response_head(bad).first()
    assert b["status_code"] is None and b["reason"] is None
    assert b["content_length"] is None


def test_http_head_parse_feeds_revalidation_plan(spark):
    """End-to-end: raw wire head → parse → revalidation plan (the
    producer/consumer handshake the two operators exist for)."""
    from sap_data_pipeline_spark.operators.temporal import (
        http_revalidation_plan,
        parse_http_response_head,
    )
    from pyspark.sql import functions as F

    head = (
        "HTTP/1.1 200 OK\r\n"
        'ETag: "abc"\r\n'
        "Cache-Control: max-age=100\r\n"
    )
    raw = spark.createDataFrame(
        [("u", head)], "url string, raw_head string"
    )
    parsed = parse_http_response_head(raw).withColumn(
        "fetched_at", F.lit(1_700_000_000).cast("long")
    )
    plan = http_revalidation_plan(parsed, now=1_700_000_050).first()
    assert plan["freshness_lifetime_sec"] == 100
    assert plan["is_fresh"] and plan["mode"] == "fresh"
    stale = http_revalidation_plan(parsed, now=1_700_000_200).first()
    assert stale["mode"] == "if-none-match"

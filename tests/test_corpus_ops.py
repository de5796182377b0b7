"""Chunking and TF-IDF operator semantics + plan shape."""

from conftest import count_hash_exchanges

import math

from pyspark.sql import functions as F

from sap_data_pipeline_spark.operators import corpus as CO
from sap_data_pipeline_spark.operators.corpus import chunk_documents, tf_idf_top_terms


def test_chunk_documents_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "solo"), (3, "")],
                               "doc_id long, text string")
    rows = {(r["doc_id"], r["chunk_idx"]): r
            for r in chunk_documents(df, budget=4, overlap=2).collect()}
    # doc 1: 10 tokens, step 2 → starts 0,2,4,6,8
    assert {i for (d, i) in rows if d == 1} == {0, 1, 2, 3, 4}
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[(1, 1)]["chunk_text"] == "t2 t3 t4 t5"      # 2-token overlap
    assert rows[(1, 4)]["chunk_text"] == "t8 t9"            # short tail
    assert rows[(1, 4)]["n_chunk_tokens"] == 2
    assert rows[(1, 1)]["start_tok"] == 2
    # single-token doc → one chunk; empty doc → no chunks
    assert rows[(2, 0)]["chunk_text"] == "solo"
    assert not any(d == 3 for (d, _) in rows)


def test_chunk_documents_zero_shuffles(spark, star):
    plan = (chunk_documents(star.documents)
            ._jdf.queryExecution().executedPlan().toString())
    assert count_hash_exchanges(plan) == 0


def test_tf_idf_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry date")],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["term"]): r for r in tf_idf_top_terms(df, k=2).collect()}
    # doc 1: apple tf=2/3 df=1 → idf=ln(4/2); banana tf=1/3 df=2 → ln(4/3)
    exp_apple = round((2 / 3) * math.log(4 / 2), 6)
    assert got[(1, "apple")]["tf_idf"] == exp_apple
    assert got[(1, "apple")]["rank"] == 1
    assert got[(1, "banana")]["rank"] == 2
    assert got[(2, "cherry")]["tf_idf"] == round(0.5 * math.log(4 / 3), 6)
    # k bound respected
    assert all(r["rank"] <= 2 for r in got.values())


def test_tf_idf_ties_break_to_smaller_term(spark):
    df = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "other words")], "doc_id long, text string"
    )
    rows = [r for r in tf_idf_top_terms(df, k=2).collect() if r["doc_id"] == 1]
    rows.sort(key=lambda r: r["rank"])
    assert [r["term"] for r in rows] == ["alpha", "zeta"]  # equal scores
    assert rows[0]["tf_idf"] == rows[1]["tf_idf"]


def test_dedup_lines_removes_corpus_repeats(spark):
    from sap_data_pipeline_spark.operators.corpus import dedup_lines

    df = spark.createDataFrame([
        (1, "BANNER\nunique one\nfooter"),
        (2, "BANNER\nunique two\nfooter"),
        (3, "BANNER\nunique three"),
        (4, "BANNER"),                        # fully boilerplate
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert got[1]["cleaned_text"] == "unique one"
    assert got[2]["cleaned_text"] == "unique two"
    assert got[3]["cleaned_text"] == "unique three"
    assert got[4]["cleaned_text"] == "" and got[4]["n_lines_kept"] == 0
    assert got[1]["n_lines_removed"] == 2    # BANNER + footer
    assert got[3]["n_lines_removed"] == 1    # footer appears only twice → 1/2
    assert len(got) == 4                     # no doc vanishes


def test_dedup_lines_preserves_order(spark):
    from sap_data_pipeline_spark.operators.corpus import dedup_lines

    df = spark.createDataFrame(
        [(1, "z last\na first\nz last2"), (2, "noise")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["cleaned_text"] for r in dedup_lines(df).collect()}
    assert got[1] == "z last\na first\nz last2"   # original order, not sorted


def test_top_ngrams_counts_and_ties(spark):
    from sap_data_pipeline_spark.operators.corpus import top_ngrams

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y")], "doc_id long, text string"
    )
    rows = top_ngrams(df, n=2, k=3).collect()
    assert [(r["ngram"], r["n_occurrences"]) for r in rows] == [
        ("a b", 3), ("b a", 1), ("b c", 1)   # ties → lexicographic
    ]


def test_corpus_ops_plan_shapes(spark, star):
    """line_dedup: line window + doc reassembly = 2 exchanges.  tfidf:
    count + term window + doc window = 3 exchanges (the rank window
    reuses the doc partitioning; the join form costs 6).  top_ngrams:
    one count exchange + TakeOrderedAndProject, never a global sort."""
    from sap_data_pipeline_spark.plans import catalog_ext  # noqa: F401  (registers)
    from sap_data_pipeline_spark.plans.catalog import QUERIES

    def plan(name):
        return (QUERIES[name](spark, star.sf_dir)
                ._jdf.queryExecution().executedPlan().toString())

    # line_dedup_c4 / tfidf: the (doc/line/term)-keyed first
    # aggregates ride the documents scan's doc_id spread key at
    # the tiny SF (r13 raw-column rebalance key) — counts are the
    # cluster upper bounds
    assert count_hash_exchanges(plan("line_dedup_c4")) <= 2
    assert count_hash_exchanges(plan("tfidf_top_terms")) <= 3
    p = plan("top_bigrams")
    assert count_hash_exchanges(p) == 1
    assert "TakeOrderedAndProject" in p


def test_chunk_documents_reconstructs_tokens(spark, star):
    """Dropping each chunk's overlap prefix (after chunk 0) and
    concatenating must reproduce the original token sequence exactly —
    the lossless-coverage contract of sliding windows."""
    from sap_data_pipeline_spark.functions import text as X

    budget, overlap = 64, 16
    docs = star.documents.limit(40)
    orig = {r["doc_id"]: r["toks"] for r in
            docs.select("doc_id", X.tokens("text").alias("toks")).collect()}
    chunks = {}
    for r in chunk_documents(docs, budget=budget, overlap=overlap).collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    for did, toks in orig.items():
        if not toks:
            assert did not in chunks
            continue
        pos: dict[int, str] = {}
        for r in chunks[did]:
            for j, t in enumerate(r["chunk_text"].split(" ")):
                p = r["start_tok"] + j
                assert pos.get(p, t) == t, f"doc {did}: overlap disagrees at {p}"
                pos[p] = t
        assert [pos[i] for i in range(len(pos))] == toks, f"doc {did} not rebuilt"


def test_extract_text_html_handwritten(spark):
    from sap_data_pipeline_spark.functions import text as X

    cases = [
        ("<p>hello <b>world</b></p>", "hello world"),
        ("<script>alert('x < y');</script>after", "after"),
        ("<style>p { color: red }</style>body", "body"),
        ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;!", 'a & b <tag> "q" \'s\' !'),
        ("&amp;lt; stays entity-ish", "&lt; stays entity-ish"),  # amp decodes LAST
        ("<a href='x'>link</a>\n\n  <i>i</i>", "link i"),
        ("no markup at all", "no markup at all"),
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(cases)],
                               "i long, html string")
    got = {r["i"]: r["c"] for r in
           df.select("i", X.extract_text_html("html").alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_url_components_handwritten(spark):
    from sap_data_pipeline_spark.functions import text as X

    df = spark.createDataFrame(
        [(1, "https://sub.site.org/a/b.html?x=1&lang=de&y=2#frag"),
         (2, "http://plain.com"),
         (3, "not a url")],
        "i long, url string",
    )
    got = {r["i"]: r for r in df.select(
        "i", X.url_host("url").alias("h"), X.url_path("url").alias("p"),
        X.url_query_param("url", "lang").alias("l")).collect()}
    assert got[1]["h"] == "sub.site.org"
    assert got[1]["p"] == "/a/b.html"
    assert got[1]["l"] == "de"
    assert got[2]["h"] == "plain.com" and got[2]["p"] == ""
    assert got[3]["h"] == "" and got[3]["l"] == ""


def test_unigram_logprob_hand_computed(spark):
    """Corpus 'a a b' / 'a c': N=5, p(a)=3/5, p(b)=p(c)=1/5; scores are
    token-weighted means of -ln p."""
    import math

    from sap_data_pipeline_spark.operators.corpus import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    s1 = (2 * -math.log(3 / 5) + -math.log(1 / 5)) / 3
    s2 = (-math.log(3 / 5) + -math.log(1 / 5)) / 2
    assert got[1]["n_tokens"] == 3 and got[2]["n_tokens"] == 2
    assert abs(got[1]["avg_neg_logprob"] - round(s1, 6)) < 1e-9
    assert abs(got[2]["avg_neg_logprob"] - round(s2, 6)) < 1e-9


def test_unigram_logprob_rare_vocab_scores_higher(spark, star):
    """A document of corpus-common tokens must score LOWER (more
    ordinary) than one of rare tokens — the filter's whole point."""
    from sap_data_pipeline_spark.operators.corpus import unigram_logprob

    scored = unigram_logprob(star.documents).join(
        star.documents.select("doc_id", "text"), "doc_id"
    )
    rows = scored.collect()
    assert len(rows) > 0 and all(r["avg_neg_logprob"] > 0 for r in rows)


def test_unigram_logprob_pruned_vocab_oov_floor(spark):
    """With vocab_size=1 only 'a' stays in the LM; b/c take the OOV
    floor p = 1/(N+1) — finite, and strictly rarer than any vocab term."""
    import math

    from sap_data_pipeline_spark.operators.corpus import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in
           unigram_logprob(df, vocab_size=1).collect()}
    oov = -math.log(1 / 6)  # N=5 -> floor 1/(N+1)
    s1 = (2 * -math.log(3 / 5) + oov) / 3
    s2 = (-math.log(3 / 5) + oov) / 2
    assert abs(got[1]["avg_neg_logprob"] - round(s1, 6)) < 1e-9
    assert abs(got[2]["avg_neg_logprob"] - round(s2, 6)) < 1e-9


def test_count_min_never_undercounts_and_merges(spark, star):
    """CMS contract: estimate >= exact for EVERY term; and the sketch is
    mergeable — cells built per shard then re-aggregated equal the
    single-pass sketch (the property that lets 100 TB shards sketch
    independently)."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.functions import text as X
    from sap_data_pipeline_spark.operators.corpus import (
        count_min_cells,
        count_min_probe,
    )

    docs = star.documents.filter(F.col("doc_id") < 100)
    exact = (
        docs.select(F.explode(X.tokens("text")).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    cells = count_min_cells(docs, width=256)
    est = count_min_probe(cells, exact.select("term"), width=256)
    joined = exact.join(est, "term").collect()
    assert len(joined) > 20  # smoke fixture has a ~30-term vocabulary
    assert all(r["cms_estimate"] >= r["exact_cnt"] for r in joined)
    # width 256 over a small corpus: estimates stay close on average
    over = sum(r["cms_estimate"] - r["exact_cnt"] for r in joined) / len(joined)
    assert over < 50, over

    # mergeability: shard sketches ADD
    a = count_min_cells(docs.filter(F.col("doc_id") % 2 == 0), width=256)
    b = count_min_cells(docs.filter(F.col("doc_id") % 2 == 1), width=256)
    merged = (
        a.unionAll(b).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    single = {(r["row"], r["bucket"]): r["cnt"] for r in cells.collect()}
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == single


def test_sharded_distinct_estimate_merges_to_global(spark, star):
    """HLL mergeability: per-shard sketches unioned must estimate the
    GLOBAL distinct count (within HLL error), regardless of how rows
    were sharded — the contract that lets 100 TB shards sketch
    independently and merge later."""
    from pyspark.sql import functions as F

    from sap_data_pipeline_spark.operators.corpus import sharded_distinct_estimate

    docs = star.documents.withColumn("shard", F.pmod("doc_id", F.lit(7)))
    exact = docs.select("text").distinct().count()
    row = sharded_distinct_estimate(docs, "text", shard_col="shard").collect()[0]
    assert row["n_shards"] == 7
    assert abs(row["merged_estimate"] - exact) / exact < 0.05

    # shard layout barely moves the estimate (sketch merge is
    # associative up to sparse->dense promotion rounding)
    alt = docs.withColumn("shard", F.pmod("doc_id", F.lit(3)))
    row2 = sharded_distinct_estimate(alt, "text", shard_col="shard").collect()[0]
    assert abs(row2["merged_estimate"] - row["merged_estimate"]) / exact < 0.02


def test_compression_ratio_differential_vs_zlib(spark):
    """Pin the codec math: every emitted row equals direct zlib on the
    same text; repetitive text compresses visibly below unique text."""
    import zlib

    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam"),
        (2, "the quick brown fox jumps over one lazy sleeping dog"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in CO.compression_ratio(df).collect()}
    assert len(got) == 4
    for i, txt in rows:
        raw = (txt or "").encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        assert got[i]["n_bytes"] == len(raw)
        assert got[i]["n_compressed"] == comp
        want = round(comp / len(raw), 6) if raw else 0.0
        assert abs(got[i]["compression_ratio"] - want) < 1e-9
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"]


def test_bpe_train_canonical_merges(spark):
    """The Sennrich walkthrough corpus: ties broken deterministically
    (count desc, lexicographic pair) — first three merges must build
    'est</w>' from the shared suffix of newest/widest."""
    words = (["low"] * 5) + (["lower"] * 2) + (["newest"] * 6) + (["widest"] * 3)
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    merges = CO.bpe_train(df, n_merges=3, min_count=1)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>")]


def test_bpe_encode_applies_ranked_merges(spark):
    merges = [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert CO.bpe_encode("newest", merges) == ["n", "e", "w", "est</w>"]
    assert CO.bpe_encode("widest newest", merges) == [
        "w", "i", "d", "est</w>", "n", "e", "w", "est</w>",
    ]
    # unknown chars fall through as singletons + end marker
    assert CO.bpe_encode("xy", merges) == ["x", "y", "</w>"]


def test_bpe_token_counts_matches_direct_encode(spark):
    rows = [
        (1, "the newest widest thing"),
        (2, "lower and lower it goes"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = CO.bpe_train(df, n_merges=10, min_count=1)
    got = {r["doc_id"]: r for r in CO.bpe_token_counts(df, merges).collect()}
    for i, txt in rows:
        want = len(CO.bpe_encode(txt, merges))
        assert got[i]["n_bpe_tokens"] == want
        assert got[i]["n_words"] == len(txt.split())
    assert got[3]["n_bpe_tokens"] == 0
    # more merges can only shorten encodings
    merges2 = CO.bpe_train(df, n_merges=40, min_count=1)
    got2 = {r["doc_id"]: r["n_bpe_tokens"]
            for r in CO.bpe_token_counts(df, merges2).collect()}
    assert all(got2[i] <= got[i]["n_bpe_tokens"] for i, _ in rows)


def test_bpe_train_deterministic(spark, star):
    docs = star.documents.limit(60)
    m1 = CO.bpe_train(docs, n_merges=25)
    m2 = CO.bpe_train(docs, n_merges=25)
    assert m1 == m2 and len(m1) == 25


def test_bpe_train_encode_tokenization_consistent(spark):
    """Punctuated corpus: training sees word 'end' (the Spark-side
    tokens split), so encoding 'end.' must fire the same merges — a
    split mismatch would over-bill every punctuated word."""
    df = spark.createDataFrame([(1, "end. end. end. end.")], "doc_id long, text string")
    merges = CO.bpe_train(df, n_merges=3, min_count=1)
    assert merges == [("d", "</w>"), ("e", "n"), ("en", "d</w>")]
    assert CO.bpe_encode("end.", merges) == ["end</w>"]
    got = CO.bpe_token_counts(df, merges).collect()[0]
    assert got["n_bpe_tokens"] == 4 and got["n_words"] == 4


def test_bm25_ranks_term_dense_doc_first(spark):
    """BM25 sanity on a crafted corpus: the doc dense in the query terms
    outranks one with a single hit; a doc with none scores 0."""
    from sap_data_pipeline_spark.plans import catalog_ext as CE
    from sap_data_pipeline_spark.plans.catalog import QUERIES

    docs = spark.createDataFrame(
        [
            (1, "table hash merge table hash merge table join scan"),
            (2, "one table appears among many other unrelated words here"),
            (3, "entirely different tokens with no query words at all"),
        ],
        "doc_id long, text string",
    )

    class FakeStar:
        documents = docs

    got = CE.bm25_search_topk(FakeStar).collect()
    order = [r["doc_id"] for r in got]
    scores = {r["doc_id"]: r["score"] for r in got}
    assert order[0] == 1
    assert scores[1] > scores[2] > scores[3] == 0.0


def test_host_boilerplate_removes_per_host_chrome(spark):
    from sap_data_pipeline_spark.operators.corpus import host_boilerplate_removal

    rows = []
    # host A: 4 docs — NAV on all 4 (100%), "half" on exactly 2 (50%,
    # boundary-inclusive at threshold 50), "once N" unique per doc.
    for i in range(4):
        body = f"NAV\nonce {i}" + ("\nhalf" if i < 2 else "")
        rows.append((i, "A", body))
    # host B: 2 docs (< min_docs=3) — NAV repeats on both but stays.
    rows += [(10, "B", "NAV\nbeta one"), (11, "B", "NAV\nbeta two")]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {
        r["doc_id"]: r
        for r in host_boilerplate_removal(
            df, host_col="host", threshold_pct=50, min_docs=3
        ).collect()
    }
    assert len(got) == 6                         # no doc vanishes
    assert got[0]["cleaned_text"] == "once 0"    # NAV + half removed
    assert got[0]["n_boilerplate_removed"] == 2
    assert got[2]["cleaned_text"] == "once 2"    # NAV removed
    assert got[2]["n_boilerplate_removed"] == 1
    assert got[10]["cleaned_text"] == "NAV\nbeta one"   # host too small
    assert got[10]["n_boilerplate_removed"] == 0


def test_host_boilerplate_is_host_scoped_not_global(spark):
    from sap_data_pipeline_spark.operators.corpus import host_boilerplate_removal

    # "SHARED" repeats on every doc of host A but only one doc of host C
    # (3 docs each): per-host scoping must remove it from A and keep it
    # in C — a corpus-global counter would remove it everywhere.
    rows = [(i, "A", f"SHARED\na{i}") for i in range(3)]
    rows += [(10, "C", "SHARED\nc0"), (11, "C", "c1"), (12, "C", "c2")]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {
        r["doc_id"]: r["cleaned_text"]
        for r in host_boilerplate_removal(
            df, host_col="host", threshold_pct=60, min_docs=3
        ).collect()
    }
    assert got[0] == "a0"
    assert got[10] == "SHARED\nc0"


def test_oov_drift_hand_computed(spark):
    from sap_data_pipeline_spark.operators.corpus import oov_drift

    ref = spark.createDataFrame(
        [(1, "en", "a a b c"), (2, "en", "a b")], "doc_id long, lang string, text string"
    )
    # vocab at min_count=2: a (3x), b (2x); c is too rare → OOV
    cur = spark.createDataFrame(
        [(3, "en", "a b c z z"), (4, "de", "a a")],
        "doc_id long, lang string, text string",
    )
    got = {r["lang"]: r for r in
           oov_drift(ref, cur, group_col="lang", min_count=2).collect()}
    assert got["en"]["n_tokens"] == 5
    assert got["en"]["n_oov"] == 3          # c + z + z (multiplicity counts)
    assert got["en"]["oov_rate"] == 0.6
    assert got["de"]["n_oov"] == 0 and got["de"]["oov_rate"] == 0.0


def test_oov_drift_self_reference_zero(spark):
    from sap_data_pipeline_spark.operators.corpus import oov_drift

    df = spark.createDataFrame(
        [(i, "en", "x y z x y z") for i in range(4)],
        "doc_id long, lang string, text string",
    )
    got = oov_drift(df, df, group_col="lang", min_count=2).collect()[0]
    assert got["n_oov"] == 0 and got["oov_rate"] == 0.0

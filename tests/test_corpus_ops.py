"""Chunking and TF-IDF operator semantics + plan shape."""

import math

from pyspark.sql import functions as F

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
    assert plan.count("Exchange hashpartitioning") == 0


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

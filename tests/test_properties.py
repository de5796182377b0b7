"""Property-based tests (SURVEY §5.4): hypothesis generates the inputs,
Spark evaluates, invariants must hold for every example.

Spark-job-per-example is expensive, so examples are capped and deadlines
disabled; the properties target the three contracts SURVEY calls out:
MERGE idempotency, fast_numeric round-trip, and group-by distributivity
over unions.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sap_data_pipeline_spark.functions.cleaning import fast_numeric
from sap_data_pipeline_spark.operators.merge import merge_upsert_frames
from sap_data_pipeline_spark.operators.relational import union_all

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.integers(min_value=0, max_value=9)
_rows = st.lists(
    st.tuples(_keys, st.integers(min_value=-1000, max_value=1000)),
    min_size=1,
    max_size=20,
)


@PROP
@given(target=_rows, source=_rows)
def test_merge_idempotent_and_source_wins(spark, target, source):
    """Replaying a MERGE changes nothing; every source key holds the
    source value; target-only keys persist untouched."""
    t = spark.createDataFrame(target, ["k", "v"])
    s = spark.createDataFrame(source, ["k", "v"]).dropDuplicates(["k"])

    once = merge_upsert_frames(t, s, ["k"])
    twice = merge_upsert_frames(once, s, ["k"])
    got_once = sorted(map(tuple, once.collect()))
    assert got_once == sorted(map(tuple, twice.collect()))

    src = dict(s.collect())
    tgt_keys = {k for k, _ in target}
    merged_by_key: dict[int, list[int]] = {}
    for k, v in got_once:
        merged_by_key.setdefault(k, []).append(v)
    for k, v in src.items():
        assert v in merged_by_key[k]
    assert set(merged_by_key) == tgt_keys | set(src)


@PROP
@given(
    nums=st.lists(
        st.decimals(
            min_value=Decimal("0"), max_value=Decimal("999999999"), places=3
        ),
        min_size=1,
        max_size=30,
    )
)
def test_fast_numeric_trailing_minus_roundtrip(spark, nums):
    """str(n) + '-' parses to exactly -n (SAP trailing-minus contract),
    with or without thousands separators."""
    rows = [(f"{n}-", f"{n:,}-", float(n)) for n in nums]
    df = spark.createDataFrame(rows, ["plain", "grouped", "expected"])
    out = df.select(
        fast_numeric("plain", "double").alias("p"),
        fast_numeric("grouped", "double").alias("g"),
        "expected",
    ).collect()
    for r in out:
        assert r["p"] == -r["expected"]
        assert r["g"] == -r["expected"]


@PROP
@given(parts=st.lists(_rows, min_size=2, max_size=4))
def test_group_union_distributivity(spark, parts):
    """sum-group-by over a union == union of per-part groups, re-grouped
    (the map-side partial-aggregation identity Spark relies on)."""
    dfs = [spark.createDataFrame(p, ["k", "v"]) for p in parts]
    direct = {
        (r["k"]): r["s"]
        for r in union_all(dfs).groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    partials = union_all(
        [d.groupBy("k").agg(F.sum("v").alias("v")) for d in dfs]
    )
    regrouped = {
        (r["k"]): r["s"]
        for r in partials.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert direct == regrouped


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    strs=st.lists(
        st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127), max_size=8),
        min_size=1, max_size=8, unique=True,
    )
)
def test_pack_ascii8_order_and_roundtrip(spark, strs):
    """pack_ascii8 is order-preserving and invertible on ≤8-char ASCII —
    the contract that lets min(<unit code>) stay a HashAggregate."""
    from sap_data_pipeline_spark.functions.cleaning import pack_ascii8, unpack_ascii8

    df = spark.createDataFrame([(s,) for s in strs], "s string")
    rows = df.select("s", pack_ascii8("s").alias("p")).withColumn(
        "u", unpack_ascii8(F.col("p"))
    ).collect()
    for r in rows:
        assert r["u"] == r["s"], (r["s"], r["p"], r["u"])
    by_str = sorted(rows, key=lambda r: r["s"])
    by_num = sorted(rows, key=lambda r: r["p"])
    assert [r["s"] for r in by_str] == [r["s"] for r in by_num]


_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=15),
    ).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=20,
)


@PROP
@given(edges=_edges)
def test_connected_components_matches_union_find(spark, edges):
    """For ANY pair graph, the distributed components must equal a
    driver-side union-find ground truth (cluster label = component min)."""
    from sap_data_pipeline_spark.operators.dedup import connected_components

    n = 16
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}

    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)],
        "id_a long, id_b long",
    ).filter(F.col("id_a") != F.col("id_b"))
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(ids, pairs).collect()}
    assert got == want


_batch = st.dictionaries(
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=-50, max_value=50),
    max_size=8,
)


@PROP
@given(d1=_batch, d2=_batch)
def test_versioned_diff_matches_dict_diff(spark, d1, d2):
    """diff(v1, v2) over merge lineage must equal the plain dict diff:
    inserts = keys only in v2, deletes = only in v1, updates = value
    changed; identical keys never appear."""
    import shutil
    import tempfile

    from sap_data_pipeline_spark.sources.versioned import VersionedParquetTable

    if not d1 or not d2:
        return  # merge() requires non-empty batches; empty-diff covered in unit tests
    root = tempfile.mkdtemp()
    try:
        t = VersionedParquetTable(spark, root)
        t.merge(spark.createDataFrame(list(d1.items()), "k int, v int"), ["k"])
        t.merge(spark.createDataFrame(list(d2.items()), "k int, v int"), ["k"])
        got = {
            r["k"]: (r["change_type"], r["n_from"], r["n_to"])
            for r in t.diff(["k"], 1, 2).collect()
        }
        # merge is an UPSERT: v2 = d1 overlaid with d2 — keys absent
        # from the source persist, so a merge lineage can never produce
        # deletes (delete coverage lives in the rollback unit test)
        s2 = {**d1, **d2}
        want = {}
        for k in s2:
            if k not in d1:
                want[k] = ("insert", 0, 1)
            elif d1[k] != s2[k]:
                want[k] = ("update", 1, 1)
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


@PROP
@given(
    st.integers(min_value=1, max_value=20),   # h
    st.integers(min_value=1, max_value=24),   # w
    st.sampled_from([3, 4]),                  # channels
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_codec_roundtrip_property(spark, h, w, ch, seed):
    """Any 8-bit RGB/RGBA image survives encode→decode pixel-exact,
    whatever per-row filters the encoder was told to use."""
    import numpy as np

    from sap_data_pipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    rng = np.random.RandomState(seed % (2**31))
    px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
    filters = rng.randint(0, 5, size=h)
    w2, h2, _, out = decode_png_pixels(encode_png(px, filters=filters))
    assert (w2, h2) == (w, h) and (out == px).all()


@PROP
@given(
    st.integers(min_value=1, max_value=24),   # h
    st.integers(min_value=1, max_value=24),   # w
    st.integers(min_value=2, max_value=64),   # palette size
    st.booleans(),                            # interlace
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_codec_roundtrip_property(spark, h, w, nc, il, seed):
    """Any paletted image survives encode→decode pixel-exact, interlaced
    or not — the LZW width-growth/clear pairing can't drift."""
    import numpy as np

    from sap_data_pipeline_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    rng = np.random.RandomState(seed % (2**31))
    pal = [tuple(int(x) for x in rng.randint(0, 256, 3)) for _ in range(nc)]
    idx = rng.randint(0, nc, size=(h, w)).astype(np.uint8)
    w2, h2, il2, px = decode_gif_pixels(encode_gif(idx, pal, interlace=il))
    assert (w2, h2, il2) == (w, h, il)
    assert (px == np.array(pal, dtype=np.uint8)[idx]).all()


_scored_pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # query id
        st.integers(min_value=10, max_value=19),  # neighbor id
        st.integers(min_value=0, max_value=5),    # score bucket
        st.integers(min_value=1, max_value=3),    # duplication factor
    ),
    min_size=1,
    max_size=24,
)


@PROP
@given(rows=_scored_pairs, k=st.integers(min_value=1, max_value=4))
def test_dense_rank_then_dedup_equals_dedup_then_row_number(spark, rows, k):
    """The r9 one-exchange ANN tail rests on this equivalence: with
    duplicates that are exact copies (same query, neighbor, score —
    the only duplicates multi-bucket collisions can produce),
    dense_rank over (score desc, neighbor asc) then dedup must give
    EXACTLY what dedup-then-row_number gave, for any collision pattern
    and any k."""
    from pyspark.sql.window import Window

    data = []
    seen = set()
    for q, n, s, dup in rows:
        if (q, n) in seen:
            continue  # one score per (query, neighbor), like real pairs
        seen.add((q, n))
        data.extend([(q, n, float(s) / 4)] * dup)
    df = spark.createDataFrame(
        data, "query_id int, neighbor_id int, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    new = {
        tuple(r)
        for r in df.withColumn("rank", F.dense_rank().over(w))
        .filter(F.col("rank") <= k)
        .dropDuplicates(["query_id", "neighbor_id"])
        .collect()
    }
    old = {
        tuple(r)
        for r in df.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    }
    assert new == old


@PROP
@given(
    n=st.integers(min_value=1, max_value=60),
    shards=st.integers(min_value=1, max_value=7),
    epoch=st.integers(min_value=0, max_value=3),
)
def test_epoch_shuffle_permutation_property(spark, n, shards, epoch):
    """For ANY corpus size / shard count / epoch: global_order is a
    bijection, every row keeps its identity, and the interleave
    invariant (order ≡ shard mod n_shards) holds."""
    from sap_data_pipeline_spark.operators.sampling import epoch_shuffle

    df = spark.range(n).select(F.col("id").alias("doc_id"))
    rows = epoch_shuffle(df, "doc_id", epoch=epoch, n_shards=shards).collect()
    assert len(rows) == n
    assert len({r["global_order"] for r in rows}) == n
    assert {r["doc_id"] for r in rows} == set(range(n))
    for r in rows:
        assert r["global_order"] % shards == r["shard"]
        assert 1 <= r["pos_in_shard"]


@PROP
@given(
    n=st.integers(min_value=1, max_value=40),
    k=st.integers(min_value=1, max_value=4),
    shards=st.integers(min_value=1, max_value=5),
)
def test_ring_negatives_structure_property(spark, n, k, shards):
    """For ANY n/k/shard count: no self-pairs, at most k·n pairs, and a
    pair budget shortfall happens ONLY via ring wraps in small shards
    (shard size ≤ k) — never for ample shards."""
    from collections import Counter

    from sap_data_pipeline_spark.operators.sampling import (
        epoch_shuffle,
        ring_negatives,
    )

    df = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = ring_negatives(df, "doc_id", k=k, n_shards=shards).collect()
    assert len(pairs) <= k * n
    for r in pairs:
        assert r["anchor"] != r["negative"]
        assert 1 <= r["j"] <= k
    # expected count: each anchor in a shard of size s emits one pair
    # per j in 1..k except when (pos-1+j) mod s lands back on itself
    # (which needs j ≡ 0 mod s, i.e. s ≤ k)
    sizes = Counter(
        r["shard"]
        for r in epoch_shuffle(df, "doc_id", n_shards=shards).collect()
    )
    expected = sum(
        s * (k - (k // s if s <= k else 0)) for s in sizes.values()
    )
    assert len(pairs) == expected


# --- r10 curation-op properties ---------------------------------------------

_tok = st.sampled_from(list("abcdefg"))
_doc = st.lists(_tok, min_size=0, max_size=12).map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=6)


@PROP
@given(texts=_docs)
def test_exact_substring_excise_subsequence_and_accounting(spark, texts):
    """For every input: clean tokens are a subsequence of the original
    tokens, n_removed == n_tokens − len(clean), sub-width docs are
    untouched, and no document vanishes."""
    from sap_data_pipeline_spark.operators.dedup import exact_substring_excise

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in exact_substring_excise(df, width=3).collect()}
    assert len(got) == len(texts)
    for i, text in enumerate(texts):
        orig = text.split() if text else []
        clean = got[i]["clean_text"].split() if got[i]["clean_text"] else []
        assert got[i]["n_tokens"] == len(orig)
        assert got[i]["n_removed"] == len(orig) - len(clean)
        it = iter(orig)
        assert all(tok in it for tok in clean), (orig, clean)  # subsequence
        if len(orig) < 3:
            assert clean == orig


@PROP
@given(texts=_docs)
def test_exact_substring_excise_identical_pair_keeps_exactly_first(spark, texts):
    """Duplicating the whole corpus under higher ids fully excises every
    copy long enough to carry a window, and never touches originals
    that were dup-free standalone."""
    from sap_data_pipeline_spark.operators.dedup import exact_substring_excise

    base = list(enumerate(texts))
    copies = [(1000 + i, t) for i, t in base]
    df = spark.createDataFrame(base + copies, "doc_id long, text string")
    solo = {
        r["doc_id"]: r["clean_text"]
        for r in exact_substring_excise(
            spark.createDataFrame(base, "doc_id long, text string"), width=3
        ).collect()
    }
    got = {r["doc_id"]: r for r in exact_substring_excise(df, width=3).collect()}
    for i, t in base:
        toks = t.split() if t else []
        if len(toks) >= 3:
            assert got[1000 + i]["clean_text"] == ""       # copy excised
        else:
            assert got[1000 + i]["clean_text"] == " ".join(toks)
        # originals keep exactly what they kept standalone (first-doc
        # canonical status is unaffected by higher-id copies)
        assert got[i]["clean_text"] == solo[i]


@PROP
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=6),
    total_frac=st.floats(min_value=0.0, max_value=1.0),
)
def test_proportional_allocation_properties(spark, sizes, total_frac):
    """Hamilton apportionment: Σ quota == total exactly; 0 ≤ quota ≤ n
    per stratum; quota is within 1 of the real-valued share."""
    from sap_data_pipeline_spark.operators.sampling import proportional_allocation

    n_total = sum(sizes)
    total = int(n_total * total_frac)
    counts = spark.createDataFrame(
        [(f"s{i}", n) for i, n in enumerate(sizes)], "stratum string, n long"
    )
    got = {r["stratum"]: r["quota"] for r in
           proportional_allocation(counts, total).collect()}
    assert sum(got.values()) == total
    for i, n in enumerate(sizes):
        q = got[f"s{i}"]
        share = total * n / n_total
        assert 0 <= q <= n
        assert abs(q - share) < 1.0 + 1e-9


@PROP
@given(
    ref=st.lists(st.sampled_from("abcd"), min_size=1, max_size=20),
    cur=st.lists(st.sampled_from("abcd"), min_size=1, max_size=20),
)
def test_drift_psi_nonnegative_symmetric_zero_on_self(spark, ref, cur):
    """PSI properties: every contribution (p−q)·ln(p/q) ≥ 0 so psi ≥ 0;
    the definition is symmetric under swapping snapshots; a snapshot
    against itself scores exactly 0."""
    from sap_data_pipeline_spark.operators.quality import drift_psi

    r = spark.createDataFrame([(x,) for x in ref], "k string")
    c = spark.createDataFrame([(x,) for x in cur], "k string")
    feats = {"k": F.col("k")}
    fwd = drift_psi(r, c, feats).collect()[0]["psi"]
    bwd = drift_psi(c, r, feats).collect()[0]["psi"]
    self_ = drift_psi(r, r, feats).collect()[0]["psi"]
    assert fwd >= 0 and bwd >= 0
    assert fwd == bwd
    assert self_ == 0.0


_texts = st.lists(
    st.text(alphabet="abcdef ", min_size=1, max_size=30),
    min_size=1, max_size=15,
)


@PROP
@given(texts=_texts, copies=st.lists(st.integers(0, 14), max_size=10))
def test_dedup_safe_split_group_atomic_property(spark, texts, copies):
    """For ANY corpus (including hash-adversarial duplicates injected at
    arbitrary ids), rows sharing a normalized-text fingerprint always
    carry the same split label."""
    from sap_data_pipeline_spark.operators.sampling import dedup_safe_split

    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [
        (1000 + j, texts[c % len(texts)]) for j, c in enumerate(copies)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_safe_split(df)
    bad = (
        out.groupBy("fingerprint")
        .agg(F.count_distinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert bad == 0


@PROP
@given(
    hi=st.integers(0, (1 << 32) - 1),
    lo=st.integers(0, (1 << 32) - 1),
    flips=st.lists(st.integers(0, 63), min_size=0, max_size=3, unique=True),
)
def test_ahash_banded_recall_within_radius_property(spark, hi, lo, flips):
    """ANY pair of 64-bit hashes within Hamming distance 3 is found by
    the banded pairing (pigeonhole: 4 bands, <= 3 damaged bits leave one
    band intact) with the exact distance reported."""
    from sap_data_pipeline_spark.operators.multimodal import (
        ahash_near_dup_pairs,
    )

    hi2, lo2 = hi, lo
    for b in flips:
        if b < 32:
            hi2 ^= 1 << (31 - b)
        else:
            lo2 ^= 1 << (63 - b)
    hashes = spark.createDataFrame(
        [(1, hi, lo), (2, hi2, lo2)],
        "media_id long, hash_hi long, hash_lo long",
    )
    out = ahash_near_dup_pairs(hashes, max_hamming=3).collect()
    assert len(out) == 1
    assert (out[0]["id_a"], out[0]["id_b"], out[0]["hamming"]) == (
        1, 2, len(flips),
    )


_url_strategy = st.builds(
    lambda scheme, up, host, port, path, slash, params, frag: (
        (scheme.upper() if up else scheme) + "://" + host
        + (f":{port}" if port else "")
        + "/" + "/".join(path)
        + ("/" if slash and path else "")
        + ("?" + "&".join(params) if params else "")
        + (f"#{frag}" if frag is not None else "")
    ),
    scheme=st.sampled_from(["http", "https"]),
    up=st.booleans(),
    host=st.sampled_from(["a.com", "B.Example.COM", "x-y.org"]),
    port=st.sampled_from([None, 80, 443, 8080]),
    path=st.lists(st.sampled_from(["p", "Q", "r2"]), max_size=3),
    slash=st.booleans(),
    params=st.lists(
        st.sampled_from(["a=1", "utm_source=x", "gclid=7", "b=2",
                         "utm_campaign=c"]),
        max_size=4,
    ),
    frag=st.sampled_from([None, "top", "sec2"]),
)


@PROP
@given(urls=st.lists(_url_strategy, min_size=1, max_size=12))
def test_canonicalize_url_idempotent_property(spark, urls):
    """canon(canon(u)) == canon(u) for any URL the grammar generates, and
    the output never carries fragments, tracking params, default ports,
    or a trailing slash."""
    from sap_data_pipeline_spark.functions.text import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(
        "url", canonicalize_url("url").alias("c1")
    ).select(
        "url", "c1", canonicalize_url("c1").alias("c2")
    )
    for r in once.collect():
        assert r["c1"] == r["c2"], (r["url"], r["c1"], r["c2"])
        assert "#" not in r["c1"] and "utm_" not in r["c1"]
        assert "gclid" not in r["c1"] and not r["c1"].endswith("/")
        # DEFAULT ports are stripped (http:80 / https:443); a
        # non-default port (https on :80, anything on :8080) is kept —
        # it addresses a different origin.
        import re as _re

        assert not _re.search(r"^http://[^/:]+:80(/|$)", r["c1"]), r["c1"]
        assert not _re.search(r"^https://[^/:]+:443(/|$)", r["c1"]), r["c1"]


@PROP
@given(
    ref_texts=st.lists(st.text(alphabet="abc ", min_size=1, max_size=10),
                       max_size=8),
    cur_texts=st.lists(st.text(alphabet="abc ", min_size=1, max_size=10),
                       min_size=1, max_size=12),
)
def test_snapshot_admission_partition_property(spark, ref_texts, cur_texts):
    """Every batch fingerprint is either admitted exactly once (with the
    min id and the true multiplicity) or present in the reference —
    never both, never dropped."""
    from sap_data_pipeline_spark.functions import text as X
    from sap_data_pipeline_spark.operators.dedup import snapshot_admission

    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ref_texts)] or [(0, "seed")],
        ["doc_id", "text"],
    )
    cur = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(cur_texts)], ["doc_id", "text"]
    )
    out = {r["fingerprint"]: (r["doc_id"], r["n_copies"])
           for r in snapshot_admission(ref, cur).collect()}
    ref_fp = {r["f"] for r in
              ref.select(X.md5_fingerprint("text").alias("f")).collect()}
    cur_fp: dict = {}
    for r in cur.select(
        "doc_id", X.md5_fingerprint("text").alias("f")
    ).collect():
        lo, n = cur_fp.get(r["f"], (None, 0))
        cur_fp[r["f"]] = (
            r["doc_id"] if lo is None else min(lo, r["doc_id"]), n + 1,
        )
    for f, (lo, n) in cur_fp.items():
        if f in ref_fp:
            assert f not in out
        else:
            assert out[f] == (lo, n)
    assert set(out) == set(cur_fp) - ref_fp


@PROP
@given(
    seen=st.lists(st.text(alphabet="abcxyz0123:/.", min_size=1, max_size=20),
                  min_size=1, max_size=30, unique=True),
    probes=st.lists(st.text(alphabet="abcxyz0123:/.", min_size=1, max_size=20),
                    min_size=1, max_size=20, unique=True),
)
def test_bloom_never_false_negative_property(spark, seen, probes):
    """For ANY seen set and ANY probe set: every probe that IS in the
    seen set reports maybe_seen=True (Bloom's no-false-negative
    contract — the property that makes the frontier gate safe), and
    bloom_hits is always in [0, k]."""
    from sap_data_pipeline_spark.operators.corpus import (
        bloom_bitmap,
        bloom_probe,
    )

    sdf = spark.createDataFrame([(u,) for u in seen], ["u"])
    bm = bloom_bitmap(sdf, "u", m_bits=1 << 10, k=3)
    pdf = spark.createDataFrame([(u,) for u in probes], ["u"])
    rows = bloom_probe(pdf, bm, "u", m_bits=1 << 10, k=3).collect()
    seen_set = set(seen)
    for r in rows:
        assert 0 <= r["bloom_hits"] <= 3
        if r["u"] in seen_set:
            assert r["maybe_seen"], r["u"]


@PROP
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.integers(0, 5), st.sampled_from(["h1", "h2", "h3"])),
        min_size=1, max_size=30,
    )
)
def test_url_change_rate_bounds_property(spark, rows):
    """change_rate ∈ [0, 1], n_changes ≤ n_fetches − 1, days_stale ≥ 0,
    and Σ n_fetches equals the input row count — for any fetch
    history."""
    from datetime import datetime

    from sap_data_pipeline_spark.operators.temporal import url_change_rate

    hist = spark.createDataFrame(
        [(i, u, datetime(2026, 1, 1 + d), h)
         for i, (u, d, h) in enumerate(rows)],
        "event_id long, url string, fetch_ts timestamp, content_hash string",
    )
    got = url_change_rate(hist, order_tiebreak="event_id").collect()
    assert sum(r["n_fetches"] for r in got) == len(rows)
    for r in got:
        assert 0.0 <= r["change_rate"] <= 1.0
        assert r["n_changes"] <= max(r["n_fetches"] - 1, 0) or \
            r["n_fetches"] == 1
        assert r["days_stale"] >= 0.0


@PROP
@given(
    w=st.lists(st.floats(0.01, 1.0), min_size=2, max_size=6),
    x=st.lists(st.floats(-2.0, 2.0), min_size=2, max_size=6),
)
def test_domain_reweight_simplex_property(spark, w, x):
    """The updated mix is always a probability simplex (weights > 0,
    sum ≈ 1) and ordering follows excess loss: for any two domains with
    equal prior weight, the higher-loss one never ends up lighter."""
    n = min(len(w), len(x))
    from sap_data_pipeline_spark.operators.sampling import domain_reweight_mw

    weights = spark.createDataFrame(
        [(f"d{i}", w[i]) for i in range(n)], "domain string, weight double")
    losses = spark.createDataFrame(
        [(f"d{i}", x[i]) for i in range(n)],
        "domain string, excess_loss double")
    got = {r["domain"]: r for r in
           domain_reweight_mw(weights, losses).collect()}
    total = sum(r["new_weight"] for r in got.values())
    assert abs(total - 1.0) < 1e-4
    for r in got.values():
        assert r["new_weight"] > 0.0


# ---------------------------------------------------------------------------
# r12 operators: within-doc line dedup, C4 line filters, robots gate
# ---------------------------------------------------------------------------

_lines = st.lists(
    st.text(alphabet="abcx .!?", min_size=0, max_size=8),
    min_size=1, max_size=8,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lines=_lines)
def test_intra_doc_line_dedup_matches_dict_keepfirst(spark, lines):
    """The kept sequence is exactly python's first-occurrence dedup of
    the trimmed non-blank lines, order preserved; counts reconcile."""
    from sap_data_pipeline_spark.operators.corpus import intra_doc_line_dedup

    df = spark.createDataFrame([(1, "\n".join(lines))],
                               "doc_id long, text string")
    out = intra_doc_line_dedup(df).collect()
    trimmed = [ln.strip() for ln in lines if ln.strip()]
    if not trimmed:
        [r] = out  # blank doc: the zero row, never a silent drop
        assert (r["n_lines"], r["n_kept"], r["n_dupes_removed"],
                r["chars_removed"], r["clean_text"]) == (0, 0, 0, 0, "")
        return
    [r] = out
    expect = list(dict.fromkeys(trimmed))
    assert r["clean_text"].split("\n") == expect
    assert r["n_lines"] == len(trimmed)
    assert r["n_kept"] == len(expect)
    assert r["n_dupes_removed"] == len(trimmed) - len(expect)
    assert r["chars_removed"] == sum(map(len, trimmed)) - sum(map(len, expect))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lines=st.lists(
    st.text(alphabet="ab c.!?", min_size=1, max_size=12),
    min_size=1, max_size=8,
))
def test_c4_line_filters_matches_python_rules(spark, lines):
    import re

    from sap_data_pipeline_spark.operators.corpus import c4_line_filters

    df = spark.createDataFrame([(1, "\n".join(lines))],
                               "doc_id long, text string")
    out = c4_line_filters(df).collect()
    trimmed = [ln.strip() for ln in lines if ln.strip()]
    if not trimmed:
        [r] = out  # blank doc: the zero row, never a silent drop
        assert (r["n_lines"], r["n_kept"], r["n_dropped_short"],
                r["n_dropped_terminal"], r["clean_text"]) == (0, 0, 0, 0, "")
        return
    [r] = out

    def words(x):
        return len(re.split(r"\s+", x))

    short = [x for x in trimmed if words(x) < 3]
    noterm = [x for x in trimmed
              if words(x) >= 3 and not re.search(r'[.!?"]$', x)]
    kept = [x for x in trimmed
            if words(x) >= 3 and re.search(r'[.!?"]$', x)]
    assert r["n_dropped_short"] == len(short)
    assert r["n_dropped_terminal"] == len(noterm)
    assert r["n_kept"] == len(kept)
    assert r["clean_text"] == "\n".join(kept)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    paths=st.lists(
        st.text(alphabet="abc/", min_size=1, max_size=6),
        min_size=1, max_size=6, unique=True,
    ),
    prefixes=st.lists(
        st.tuples(st.text(alphabet="abc/*$", min_size=1, max_size=4),
                  st.booleans()),
        min_size=0, max_size=5,
    ),
)
def test_robots_gate_matches_python_precedence(spark, paths, prefixes):
    """RFC 9309 replica: longest matching RULE wins, allow beats
    disallow on equal length, lexicographic rule as the final tie,
    no match ⇒ allowed — with the §2.2.3 specials: '*' matches any
    character sequence, a trailing '$' anchors to the path end, both
    literal anywhere else (the rule alphabet includes them, so
    hypothesis explores mid-rule '$', bare '*', '**', and '*$')."""
    import re as _re

    from sap_data_pipeline_spark.operators.corpus import robots_disallow_gate

    def rule_re(rule):
        anchored = rule.endswith("$")
        body = rule[:-1] if anchored else rule
        esc = _re.sub(r'([.+?(){}\[\]|^$\\])', r'\\\1', body)
        return "^" + esc.replace("*", ".*") + ("$" if anchored else "")

    frontier = spark.createDataFrame(
        [(f"https://h/{p}",) for p in paths], "url string"
    )
    rules = spark.createDataFrame(
        [("h", "/" + p, a) for p, a in prefixes],
        "host string, path_prefix string, allow boolean",
    ) if prefixes else spark.createDataFrame(
        [], "host string, path_prefix string, allow boolean"
    )
    got = {r["url"]: r for r in
           robots_disallow_gate(frontier, rules).collect()}
    assert len(got) == len(paths)
    for p in paths:
        path = "/" + p
        matches = [("/" + pre, allow) for pre, allow in prefixes
                   if _re.search(rule_re("/" + pre), path)]
        if matches:
            # sort: longest first, allow before disallow, lexicographic
            matches.sort(key=lambda m: (-len(m[0]), not m[1], m[0]))
            mp, allow = matches[0]
        else:
            mp, allow = None, True
        r = got[f"https://h/{p}"]
        assert r["matched_prefix"] == mp, (path, matches)
        assert r["allowed"] == allow


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.floats(min_value=-1.0, max_value=1.0,
              allow_nan=False, allow_infinity=False),
    min_size=2, max_size=6,
))
def test_group_centroid_matches_quantized_mean(spark, vals):
    from sap_data_pipeline_spark.operators.similarity import group_centroids

    emb = spark.createDataFrame(
        [(i, "g", [v]) for i, v in enumerate(vals)],
        "vec_id long, src string, embedding array<double>",
    )
    [r] = group_centroids(emb, "src").collect()
    expect = sum(round(v * 1e9) for v in vals) / (len(vals) * 1e9)
    assert r["centroid"][0] == expect
    assert r["n_members"] == len(vals)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(directives=st.lists(
    st.tuples(
        st.sampled_from(["User-agent", "Disallow", "Allow", "Crawl-delay",
                         "Sitemap"]),
        st.sampled_from(["*", "googlebot", "/a", "/a/b", "", "5", "x7"]),
    ),
    min_size=1, max_size=12,
))
def test_parse_robots_txt_matches_python_replica(spark, directives):
    """Grammar replica: block grouping (consecutive UA lines share a
    group), star-group selection, pre-group directives ignored, empty
    Disallow skipped, numeric-only Crawl-delay, unknown keys dropped."""
    from sap_data_pipeline_spark.operators.corpus import parse_robots_txt

    body = "\n".join(f"{k}: {v}" for k, v in directives)
    df = spark.createDataFrame([("h", body)],
                               "host string, robots_txt string")
    got_rules = set()
    got_delays = []
    for r in parse_robots_txt(df).collect():
        if r["path_prefix"] is not None:
            got_rules.add((r["path_prefix"], r["allow"]))
        if r["crawl_delay_sec"] is not None:
            got_delays.append(r["crawl_delay_sec"])

    # python replica.  RFC 9309: unrecognized lines are IGNORED — they
    # neither terminate a UA group nor start one, so drop them before
    # grouping (two UA lines separated only by ignored lines share a
    # group, the hypothesis-found case).
    blocks, cur, prev_ua = [], None, False
    known = [(k, v) for k, v in directives
             if k.lower() in ("user-agent", "disallow", "allow",
                              "crawl-delay")]
    for k, v in known:
        k_l, v_t = k.lower(), v.strip()
        if k_l == "user-agent":
            if not prev_ua:
                cur = {"agents": [], "dirs": []}
                blocks.append(cur)
            cur["agents"].append(v_t.lower())
            prev_ua = True
        else:
            prev_ua = False
            if cur is not None and k_l in ("disallow", "allow", "crawl-delay"):
                cur["dirs"].append((k_l, v_t))
    want_rules, want_delays = set(), []
    for b in blocks:
        if "*" not in b["agents"]:
            continue
        for k_l, v_t in b["dirs"]:
            if k_l in ("disallow", "allow") and v_t != "":
                want_rules.add((v_t, k_l == "allow"))
            elif k_l == "crawl-delay" and v_t.isdigit():
                want_delays.append(int(v_t))
    assert got_rules == want_rules
    assert sorted(got_delays) == sorted(want_delays)

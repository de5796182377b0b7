"""sources.artifacts — the durable content-addressed index store
(r8 verdict #2): fingerprint sensitivity, atomic commit, build-once
semantics, and the synthetic-star fallback path."""

from __future__ import annotations

import os

import pytest

from sap_data_pipeline_spark.sources import artifacts as A


@pytest.fixture()
def corpus_dir(tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    (d / "documents.parquet").write_bytes(b"x" * 64)
    return str(d)


def test_fingerprint_keys_content_params_and_version(corpus_dir):
    base = A.corpus_fingerprint(corpus_dir, "documents", params="p1")
    assert base is not None
    # params and format version each address a different artifact
    assert A.corpus_fingerprint(corpus_dir, "documents", params="p2") != base
    assert A.corpus_fingerprint(
        corpus_dir, "documents", params="p1", version="v2"
    ) != base
    # same inputs → same key (deterministic, restart-stable)
    assert A.corpus_fingerprint(corpus_dir, "documents", params="p1") == base


def test_fingerprint_tracks_file_changes(corpus_dir):
    before = A.corpus_fingerprint(corpus_dir, "documents", params="p")
    f = os.path.join(corpus_dir, "documents.parquet")
    os.utime(f, ns=(1, 1))  # mtime change = rewrite = new corpus
    after = A.corpus_fingerprint(corpus_dir, "documents", params="p")
    assert after != before
    # size change too
    with open(f, "ab") as fh:
        fh.write(b"y")
    assert A.corpus_fingerprint(corpus_dir, "documents", params="p") != after


def test_fingerprint_directory_table_ignores_markers(tmp_path):
    d = tmp_path / "sf"
    (d / "events.parquet").mkdir(parents=True)
    (d / "events.parquet" / "part-0.parquet").write_bytes(b"a" * 10)
    fp1 = A.corpus_fingerprint(str(d), "events", params="p")
    # _SUCCESS / hidden files don't change the key
    (d / "events.parquet" / "_SUCCESS").write_bytes(b"")
    (d / "events.parquet" / ".crc").write_bytes(b"z")
    assert A.corpus_fingerprint(str(d), "events", params="p") == fp1
    # a new data part does
    (d / "events.parquet" / "part-1.parquet").write_bytes(b"b" * 10)
    assert A.corpus_fingerprint(str(d), "events", params="p") != fp1


def test_fingerprint_missing_source_is_none(tmp_path):
    assert A.corpus_fingerprint(str(tmp_path), "documents", params="p") is None
    assert A.corpus_fingerprint("", "documents", params="p") is None


def test_load_or_build_builds_once_and_serves_cold(spark, tmp_path,
                                                   monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "arts"))
    calls = []

    def build():
        calls.append(1)
        return {
            "pairs": spark.createDataFrame([(1, 2), (2, 3)], "a int, b int"),
            "cc": spark.createDataFrame([(1, 1)], "id int, lbl int"),
        }

    got = A.load_or_build(spark, "fam", "fp123", build)
    assert set(got) == {"pairs", "cc"}
    assert got["pairs"].count() == 2 and got["cc"].count() == 1
    # second call (a "cold session"): served from storage, no rebuild
    again = A.load_or_build(spark, "fam", "fp123", build)
    assert len(calls) == 1
    assert again["pairs"].count() == 2
    # committed layout: final dir present, no tmp leftovers
    fam = tmp_path / "arts" / "fam"
    assert sorted(os.listdir(fam)) == ["fp123"]
    # a different fingerprint is a different artifact → rebuild
    A.load_or_build(spark, "fam", "fp456", build)
    assert len(calls) == 2


def test_load_or_build_loser_of_commit_race_reads_winner(spark, tmp_path,
                                                         monkeypatch):
    """If the final path appears between the existence check and the
    rename (a concurrent builder won), the loser must discard its tmp
    and serve the winner's frames."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "arts"))
    final = tmp_path / "arts" / "fam" / "fp1"

    def winner_then_build():
        # simulate the race: the winner commits while we are building
        os.makedirs(final / "t")
        spark.createDataFrame([(9,)], "v int").write.mode(
            "overwrite"
        ).parquet(str(final / "t"))
        return {"t": spark.createDataFrame([(1,)], "v int")}

    got = A.load_or_build(spark, "fam", "fp1", winner_then_build)
    # the pre-committed (winner's) value is what gets served
    assert [r["v"] for r in got["t"].collect()] == [9]
    # loser's tmp cleaned up
    fam = tmp_path / "arts" / "fam"
    assert sorted(os.listdir(fam)) == ["fp1"]


def test_default_root_is_per_user_cache(monkeypatch, tmp_path):
    """Without the env override the root lives under the USER's cache
    dir (XDG_CACHE_HOME, else ~/.cache), never a world-shared tmp dir:
    artifacts determine query results, so a predictable world-writable
    path would let another local user pre-plant poisoned models."""
    monkeypatch.delenv("SPARK_GRAFT_ARTIFACT_DIR", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    assert A.artifact_root() == str(tmp_path / "xdg" / "spark_graft_artifacts")
    monkeypatch.delenv("XDG_CACHE_HOME")
    monkeypatch.setenv("HOME", str(tmp_path / "home"))
    assert A.artifact_root() == str(
        tmp_path / "home" / ".cache" / "spark_graft_artifacts"
    )
    # env override still wins (tests and ops point it wherever they like)
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "arts"))
    assert A.artifact_root() == str(tmp_path / "arts")


def test_checked_root_creates_0700_and_verifies_ownership(monkeypatch,
                                                          tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "arts"))
    root = A._checked_root()
    assert os.path.isdir(root)
    assert os.stat(root).st_mode & 0o777 == 0o700
    # a root owned by a different uid is a hard error, not a fallback
    monkeypatch.setattr(os, "getuid", lambda: os.stat(root).st_uid + 1)
    with pytest.raises(RuntimeError, match="owned by uid"):
        A._checked_root()


def test_fingerprint_keys_builder_code_version(corpus_dir, monkeypatch):
    """ARTIFACT_VERSION is part of every fingerprint: bumping it (done
    whenever a build algorithm changes) must re-address all artifacts so
    old-code output is never served under new-code semantics."""
    base = A.corpus_fingerprint(corpus_dir, "documents", params="p")
    monkeypatch.setattr(A, "ARTIFACT_VERSION", A.ARTIFACT_VERSION + ".bump")
    assert A.corpus_fingerprint(corpus_dir, "documents", params="p") != base


def test_prune_tolerates_concurrent_removal(spark, tmp_path, monkeypatch):
    """An entry vanishing between listdir and stat (a racing pruner or a
    committing builder) is skipped, not raised — prune() is safe to run
    from round hygiene while sessions are live."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "arts"))
    A.load_or_build(
        spark, "fam", "gone",
        lambda: {"t": spark.createDataFrame([(1,)], "v int")},
    )
    A.load_or_build(
        spark, "fam", "old",
        lambda: {"t": spark.createDataFrame([(1,)], "v int")},
    )
    fam = tmp_path / "arts" / "fam"
    os.utime(fam / "old", ns=(0, 0))
    real_stat = os.stat

    def racing_stat(path, *a, **k):
        if os.path.basename(str(path)) == "gone":
            raise FileNotFoundError(path)
        return real_stat(path, *a, **k)

    monkeypatch.setattr(os, "stat", racing_stat)
    removed = A.prune(keep_seconds=3600)
    assert {os.path.basename(p) for p in removed} == {"old"}


def test_round_hygiene_cutoff_keeps_fresh_artifacts(spark, tmp_path,
                                                    monkeypatch):
    """The round-hygiene prune (bench.py: keep_seconds=7 days) must
    never evict an artifact served this round — the LRU touch happens
    at load time, and 7 days is far above any session lifetime."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "arts"))
    A.load_or_build(
        spark, "fam", "fresh",
        lambda: {"t": spark.createDataFrame([(1,)], "v int")},
    )
    assert A.prune(keep_seconds=7 * 86400) == []
    assert os.path.isdir(tmp_path / "arts" / "fam" / "fresh")


def test_prune_ages_out_by_last_serve(spark, tmp_path, monkeypatch):
    """prune(): fingerprints not served within the horizon are removed
    (mtime is touched on every load_or_build hit, so recently-served
    artifacts survive even if built long ago); tmp leftovers age out
    the same way; a pruned artifact rebuilds transparently."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "arts"))
    calls = []

    def build():
        calls.append(1)
        return {"t": spark.createDataFrame([(1,)], "v int")}

    A.load_or_build(spark, "fam", "old", build)
    A.load_or_build(spark, "fam", "hot", build)
    fam = tmp_path / "arts" / "fam"
    os.utime(fam / "old", ns=(0, 0))  # last served at epoch
    stale_tmp = fam / "dead.__tmp__x"
    stale_tmp.mkdir()
    os.utime(stale_tmp, ns=(0, 0))

    removed = A.prune(keep_seconds=3600)
    assert {os.path.basename(p) for p in removed} == {"old", "dead.__tmp__x"}
    assert sorted(os.listdir(fam)) == ["hot"]
    # serving "hot" touched it; pruning again removes nothing
    A.load_or_build(spark, "fam", "hot", build)
    assert A.prune(keep_seconds=3600) == []
    # the pruned artifact just rebuilds on next demand
    A.load_or_build(spark, "fam", "old", build)
    assert len(calls) == 3


def test_reference_distribution_served_from_store(spark, tmp_path, monkeypatch):
    """The PSI reference distribution persists: second call with the same
    corpus + features reads the committed parquet (no rebuild); a
    changed feature set gets its own key; in-memory frames (no sf_dir)
    fall back to a plain in-process build."""
    import pyspark.sql.functions as F

    from sap_data_pipeline_spark.operators.quality import (
        drift_psi,
        psi_from_counts,
        reference_distribution,
    )
    from sap_data_pipeline_spark.sources import artifacts as A

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "store"))

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = {"lang": F.col("lang")}

    calls = {"n": 0}
    orig = A.load_or_build

    def counting(spark_, family, fp, build):
        def counted_build():
            calls["n"] += 1
            return build()
        return orig(spark_, family, fp, counted_build)

    monkeypatch.setattr(A, "load_or_build", counting)

    a = reference_distribution(docs, feats, sf_dir=sf_dir).collect()
    b = reference_distribution(docs, feats, sf_dir=sf_dir).collect()
    assert calls["n"] == 1                       # second call served, not rebuilt
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    feats2 = {"lang": F.col("lang"), "source": F.col("source")}
    reference_distribution(docs, feats2, sf_dir=sf_dir).collect()
    assert calls["n"] == 2                       # different feature set → new key

    # served counts drive PSI identically to the direct operator
    ref_counts = reference_distribution(docs, feats, sf_dir=sf_dir)
    cur = docs.filter(F.col("doc_id") % 2 == 1)
    from sap_data_pipeline_spark.operators.quality import feature_bucket_counts
    via_store = psi_from_counts(
        ref_counts.withColumnRenamed("cnt", "ref_cnt"),
        feature_bucket_counts(cur, feats).withColumnRenamed("cnt", "cur_cnt"),
    ).collect()[0]["psi"]
    direct = drift_psi(docs, cur, feats).collect()[0]["psi"]
    assert via_store == direct

    # no corpus files to fingerprint → in-process build, no persistence
    mem = spark.createDataFrame([("en",), ("de",)], "lang string")
    got = reference_distribution(mem, feats, sf_dir=None).collect()
    assert {r["bucket"] for r in got} == {"en", "de"}

"""Round-13 measurement battery (results in SCALE.md r13 section).

Three independent batteries, each originally run as a standalone
script on a quiet machine; select with argv[1] in
{robots_ab, line_dedup_ab, kernels} (kernels takes optional operator
names after the selector).

* robots_ab    — robots_disallow_gate window vs map-side fold, 1x/20x
                 frontier (r12 verdict #5).  RESULT: window wins 1.9x
                 at 20x; fold kept as documented loser.
* line_dedup_ab — intra_doc_line_dedup array_position scan vs O(L)
                 map-accumulator fold at L in {50,500,2000} (r12
                 verdict #7).  RESULT: fold 4-10x slower, gap grows
                 with L; scan stays production.
* kernels      — 1x/20x synthetic rows for the six r13 operators.
"""
import sys

_SEL = sys.argv[1] if len(sys.argv) > 1 else "kernels"
sys.argv = [sys.argv[0]] + sys.argv[2:]


if _SEL == "robots_ab":
    # --- A/B 1: robots gate window vs fold ---
    import sys
    import time

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    RULES = [("/a", False), ("/a/pub", True), ("/dup", True), ("/dup", False),
             ("/*/w", False), ("/a/x*", True), ("/a$", True),
             ("/d*p/z", False), ("/dup/*", True)]
    N_HOSTS = 500


    def make_frontier(n):
        d = F.col("id")
        h = F.pmod(d, F.lit(N_HOSTS)).cast("string")
        url = (
            F.when(F.pmod(d, F.lit(6)) == 0, F.concat(
                F.lit("https://h"), h, F.lit("/a/x"),
                F.pmod(d, F.lit(97)).cast("string")))
            .when(F.pmod(d, F.lit(6)) == 1,
                  F.concat(F.lit("https://h"), h, F.lit("/a/pub/y")))
            .when(F.pmod(d, F.lit(6)) == 2,
                  F.concat(F.lit("//h"), h, F.lit("/dup/z")))
            .when(F.pmod(d, F.lit(6)) == 3,
                  F.concat(F.lit("h"), h, F.lit("/free/w"),
                           F.pmod(d, F.lit(997)).cast("string")))
            .when(F.pmod(d, F.lit(6)) == 4,
                  F.concat(F.lit("https://h"), h, F.lit("/a")))
            .otherwise(F.concat(F.lit("https://z"), h, F.lit("/a/x"),
                                F.pmod(d, F.lit(89)).cast("string")))
        )
        return spark.range(n).select(url.alias("url"))


    rules = spark.createDataFrame(
        [(f"h{i}", p, a) for i in range(N_HOSTS) for (p, a) in RULES],
        "host string, path_prefix string, allow boolean",
    )

    from sap_data_pipeline_spark.operators.corpus import (
        robots_disallow_gate,
        robots_disallow_gate_fold,
    )

    for n in [100_000, 2_000_000]:
        frontier = make_frontier(n).cache()
        frontier.count()
        wc = robots_disallow_gate(frontier, rules).count()
        fc = robots_disallow_gate_fold(frontier, rules).count()
        assert wc == fc, (wc, fc)
        for impl, name in [(robots_disallow_gate, "window"),
                           (robots_disallow_gate_fold, "fold")] * 3:
            t0 = time.time()
            impl(frontier, rules).write.format("noop").mode("overwrite").save()
            print(f"n={n:9d} {name}: {time.time()-t0:6.2f}s  (rows={wc})",
                  flush=True)
        frontier.unpersist()

if _SEL == "line_dedup_ab":
    # --- A/B 2: intra-doc line dedup posscan vs mapfold ---
    import sys
    import time

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")


    def make_df(n_docs, n_lines):
        # ~30% duplicate lines (mod keeps a smaller alphabet)
        return spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_lines - 1)),
                    lambda i: F.concat(
                        F.lit("line "),
                        F.pmod(F.col("id") * 7 + i * i, F.lit(int(n_lines * 0.7)))
                        .cast("string"),
                    ),
                ),
            ).alias("text"),
        )


    def current_impl(df):
        from sap_data_pipeline_spark.operators.corpus import intra_doc_line_dedup
        return intra_doc_line_dedup(df)


    def fold_impl(df):
        from sap_data_pipeline_spark.functions import text as X

        lines = X.line_array(F.col("text"))
        base = df.select(F.col("doc_id"), lines.alias("_l"))
        acc0 = F.struct(
            F.create_map(F.lit("\x00"), F.lit(True)).alias("seen"),
            F.array().cast("array<string>").alias("out"),
        )
        folded = F.aggregate(
            F.col("_l"),
            acc0,
            lambda a, x: F.when(
                F.map_contains_key(a["seen"], x), a
            ).otherwise(
                F.struct(
                    F.map_concat(a["seen"], F.create_map(x, F.lit(True)))
                    .alias("seen"),
                    F.concat(a["out"], F.array(x)).alias("out"),
                )
            ),
        )
        kept = folded["out"]
        return base.select(
            "doc_id",
            F.size("_l").cast("long").alias("n_lines"),
            F.size(kept).cast("long").alias("n_kept"),
            (F.size("_l") - F.size(kept)).cast("long").alias("n_dupes_removed"),
            (
                F.aggregate(F.col("_l"), F.lit(0).cast("long"),
                            lambda a, x: a + F.length(x))
                - F.aggregate(kept, F.lit(0).cast("long"),
                              lambda a, x: a + F.length(x))
            ).alias("chars_removed"),
            F.concat_ws("\n", kept).alias("clean_text"),
        )


    def run(df, impl):
        t0 = time.time()
        impl(df).write.format("noop").mode("overwrite").save()
        return time.time() - t0


    for n_docs, n_lines in [(20000, 50), (2000, 500), (500, 2000)]:
        df = make_df(n_docs, n_lines).cache()
        df.count()
        # equivalence check once per shape
        a = current_impl(df).orderBy("doc_id").limit(5).collect()
        b = fold_impl(df).orderBy("doc_id").limit(5).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], "MISMATCH"
        for impl, name in [(current_impl, "posscan"), (fold_impl, "mapfold")] * 3:
            dt = run(df, impl)
            print(f"L={n_lines:5d} docs={n_docs:6d} {name}: {dt:6.2f}s", flush=True)
        df.unpersist()

if _SEL == "kernels":
    # --- Battery 3: r13 new-operator 1x/20x kernels ---
    import sys
    import time

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")


    def timeit(df_fn):
        best = None
        for i in range(3):  # run 1 = warm, then best of 2
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i and (best is None or dt < best):
                best = dt
        return best


    def urls(n):
        d = F.col("id")
        h = F.pmod(d, F.lit(2000)).cast("string")
        return spark.range(n).select(
            F.concat(
                F.lit("https://h"), h, F.lit("/p%2fx/"),
                F.pmod(d, F.lit(7)).cast("string"),
                F.lit("/%41b/c?q="), d.cast("string"), F.lit("&s=%7e"),
            ).alias("url")
        )


    def docs_multiline(n, n_lines=20):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_lines - 1)),
                    lambda i: F.concat(
                        F.lit("line "),
                        F.pmod(F.col("id") * 3 + i * 7, F.lit(n * n_lines // 3))
                        .cast("string"),
                    ),
                ),
            ).alias("text"),
        )


    def audio_docs(n):
        return spark.range(n).select(F.col("id").alias("doc_id"))


    results = {}

    from sap_data_pipeline_spark.functions import text as X
    from sap_data_pipeline_spark.operators.corpus import (
        global_line_keep_first,
        url_trap_signals,
    )
    from sap_data_pipeline_spark.operators import multimodal as MM
    from sap_data_pipeline_spark.operators.dedup import minhash_estimate_audit

    KERNELS = {
        "url_percent_normalize": (
            lambda n: (lambda df=urls(n): (lambda: df.select(
                X.percent_normalize_url("url").alias("n"))))(),
            50_000,
        ),
        "url_trap_detector": (
            lambda n: (lambda df=urls(n): (lambda: url_trap_signals(df)))(),
            50_000,
        ),
        "global_line_keep_first": (
            lambda n: (lambda df=docs_multiline(n): (
                lambda: global_line_keep_first(df)))(),
            50_000,
        ),
        "audio_fp_pairs": (
            lambda n: (lambda df=audio_docs(n): (lambda: MM.audio_fp_pairs(
                MM.audio_energy_fingerprint(
                    MM.synth_wav_media_templated(df, n_templates=max(40, n // 200))
                ))))(),
            3_000,
        ),
        "video_scene_cuts": (
            lambda n: (lambda df=audio_docs(n): (lambda: MM.video_scene_cuts(
                MM.synth_y4m_media_scenes(df))))(),
            3_000,
        ),
        "minhash_jaccard_estimate": (
            lambda n: (lambda df=spark.range(n).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", F.transform(
                    F.sequence(F.lit(0), F.lit(30)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod((F.col("id") / 50).cast("long") + i * 13, F.lit(5000))
                        .cast("string")))).alias("text"),
            ): (lambda: minhash_estimate_audit(df)))(),
            10_000,
        ),
    }

    name_filter = sys.argv[1:] or list(KERNELS)
    for name in name_filter:
        mk, base = KERNELS[name]
        t1 = timeit(mk(base))
        t20 = timeit(mk(base * 20))
        print(f"{name}: 1x({base})={t1:.2f}s 20x={t20:.2f}s "
              f"ratio={t20 / t1:.1f}x", flush=True)

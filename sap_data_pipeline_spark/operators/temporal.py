"""Temporal join operators: as-of join and bounded range join.

The reference has only equi-joins (SURVEY §2.3), but a time-series
warehouse built on its data model (snapshot inventory, event streams)
needs two more join shapes that Spark lacks as primitives:

* **as-of join** — for each probe row, the single most recent build row
  at-or-before the probe timestamp (per key).  Implemented as
  union + running ``last(ignorenulls)`` window — ONE shuffle keyed on the
  join key and a per-partition sort, versus the naive range-join which
  explodes to O(probe × build) rows per key before picking the max.
  At 100 TB the window formulation is the only one that survives: state
  per row is a single carried struct, AQE handles key skew on the
  shuffle, and nothing is broadcast or replicated.

* **bounded range join** — probe timestamps against fixed-width window
  intervals.  Implemented as explode-to-equi-join: each event emits its
  (bounded, small) set of candidate window starts, then an equi-join
  against the window dim.  This keeps Catalyst in hash-join land; a
  naive ``ts BETWEEN start AND end`` join would fall back to
  BroadcastNestedLoopJoin and scan every (row × window) pair.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sap_data_pipeline_spark.functions.sizing import right_size


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    strict: bool = False,
    how: str = "left",
) -> DataFrame:
    """Backward as-of join: for each probe row, attach the build row with
    the greatest ``right_ts`` <= ``left_ts`` (``<`` when ``strict``) for
    the same ``on`` key; build columns are NULL when no such row exists
    (``how="left"``) or the probe row is dropped (``how="inner"``).

    Matches DuckDB ``ASOF LEFT JOIN ... ON p.k = b.k AND p.ts >= b.ts``.

    Column contract: probe and build must not share non-key column names
    (rename the build timestamp, e.g. ``click_ts``).  When several build
    rows share (key, right_ts), the survivor is the one with the
    greatest payload struct (deterministic lexicographic tiebreak).

    Plan shape: union the two sides tagged with a side marker, shuffle
    once on ``on``, sort each partition by (ts, side), and carry the
    last non-null build payload forward.  No join node at all.
    """
    on = list(on)
    p_payload = [c for c in probe.columns if c not in on]
    b_payload = [c for c in build.columns if c not in on]
    overlap = set(p_payload) & set(b_payload)
    if overlap:
        raise ValueError(f"probe/build column collision: {sorted(overlap)}")

    p_struct = F.struct(*[F.col(c) for c in p_payload])
    b_struct = F.struct(*[F.col(c) for c in b_payload])
    p_type = probe.select(p_struct.alias("_p")).schema["_p"].dataType
    b_type = build.select(b_struct.alias("_b")).schema["_b"].dataType

    pu = probe.select(
        *on,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        p_struct.alias("_p"),
        F.lit(None).cast(b_type).alias("_b"),
    )
    bu = build.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(p_type).alias("_p"),
        b_struct.alias("_b"),
    )
    # Tie order at equal timestamps decides >= vs >: build-before-probe
    # makes an equal-ts build row visible (>=); probe-first hides it (>).
    tie = F.col("_side").desc() if strict else F.col("_side").asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats").asc(), tie, F.col("_b").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        pu.unionByName(bu)
        .withColumn("_bm", F.last("_b", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("_bm").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    return matched.select(
        *on,
        *[F.col(f"_p.{c}").alias(c) for c in p_payload],
        *[F.col(f"_bm.{c}").alias(c) for c in b_payload],
    )


def explode_to_date_windows(
    df: DataFrame,
    ts_col: str,
    windows: DataFrame,
    *,
    window_days: int,
    start_col: str = "win_start",
) -> DataFrame:
    """Bounded range join: rows × sliding date windows of ``window_days``
    length (one window per start date in ``windows[start_col]``); a row
    with timestamp t matches every window where
    ``start <= t < start + window_days``.

    Each row explodes to its ``window_days`` candidate start dates, then
    equi-joins the window dim — fan-out is bounded by the window width,
    the join stays a (broadcastable) hash join, and zero-match windows
    drop out exactly like the inequality-join formulation.
    """
    d = F.col(ts_col).cast("date")
    candidates = F.sequence(F.date_sub(d, window_days - 1), d)
    return df.withColumn(start_col, F.explode(candidates)).join(
        F.broadcast(windows), start_col, "inner"
    )


def resample_gapfill(
    df: DataFrame,
    key_col: str,
    date_col: str,
    *,
    fill_zero: Sequence[str] = (),
    fill_forward: Sequence[str] = (),
) -> DataFrame:
    """Regularize a sparse per-key daily series onto a dense date spine —
    the `time_bucket_gapfill` shape: every key gets one row per calendar
    day between its first and last observation, absent days filled by
    policy (``fill_zero`` → 0, ``fill_forward`` → last observed value,
    i.e. locf).  Input must already be at (key, day) grain.

    Scale shape: the spine is generated per key from its own (min, max)
    bounds — `sequence` + `explode`, so spine cardinality is
    Σ span_days(key), never global_span × keys — and re-joins the
    observations on (key, day).  The forward-fill is one
    `last(ignorenulls)` window on the same key partitioning; with the
    spine built from a re-aggregate of the input, AQE reuses the
    (key)-keyed exchange.  Dense-output beware: a key spanning years
    with one observation emits its full span — that is the operator's
    contract (loaders want rectangular series), not an accident.
    """
    overlap = set(fill_zero) & set(fill_forward)
    if overlap:
        raise ValueError(f"columns in both fill policies: {sorted(overlap)}")
    bounds = df.groupBy(key_col).agg(
        F.min(date_col).alias("_d0"), F.max(date_col).alias("_d1")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("interval 1 day"))
        ).alias(date_col),
    )
    out = spine.join(df, [key_col, date_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in fill_zero:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0).cast("double")))
    for c in fill_forward:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
) -> DataFrame:
    """First-order transition counts: for each key's event sequence in
    ``order_col`` order, count (state → next state) adjacencies across
    the whole corpus — the Markov-chain / clickstream-path summary
    behind "what do users do after X".

    One shuffle on the key; ``lead`` is a window over the per-key sort,
    and the (from, to) aggregate reuses cheap narrow rows.  Terminal
    events (no successor) drop out — row counts equal Σ(len(seq) - 1).
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    return (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_size: int,
    on: Sequence[str] = (),
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """General interval-overlap join (closed intervals, numeric axis):
    emit one row per (left, right) pair with
    ``left_start <= right_end AND right_start <= left_end`` (and equal
    ``on`` keys, if given) — the session-vs-window / downtime-vs-
    activity / range-containment join the reference's equi-join surface
    cannot express.

    Naively this is a theta join: Catalyst plans ``ON overlap`` as
    BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, the single worst
    plan available at 100 TB.  The scalable formulation quantizes the
    axis into fixed ``bin_size`` ticks: each interval explodes to the
    bins it covers (fan-out bounded by span/bin_size + 1 — pick
    ``bin_size`` near the TYPICAL interval span so the fan-out is a
    small constant), the join becomes an equi hash join on
    ``on + [bin]``, and each surviving pair is emitted exactly ONCE —
    in the bin containing ``greatest(left_start, right_start)``, which
    overlap guarantees lies inside both intervals — so no distinct
    pass is needed afterwards.

    Endpoint columns must be numeric (cast timestamps to epoch seconds
    first); malformed intervals (start > end) are dropped, not joined.
    Non-key column names must be disjoint (same contract as
    :func:`asof_join`).  With empty ``on`` the join key is the bin
    alone — fine when the axis spans many bins (key cardinality =
    axis/bin_size, AQE splits any hot bin); add a real key (user, host,
    chromosome) whenever the workload has one.

    ``max_bins_per_interval`` is the blow-up guard (the LSH bucket-cap
    policy applied to fan-out): one garbage row with ``end`` near the
    numeric max would otherwise ask ``sequence()`` for billions of
    bins and kill the stage.  Intervals wider than the cap are DROPPED
    (recall degrades on corrupt rows; memory never) — audit them with
    ``df.filter((end - start) / bin_size >= cap)`` upstream if the
    workload needs the census.
    """
    if bin_size <= 0:
        # non-ANSI division by zero yields NULL bins (silently empty
        # join) and a negative bin_size flips the floor — fail loudly
        raise ValueError(f"bin_size must be positive, got {bin_size}")
    if max_bins_per_interval <= 0:
        raise ValueError(
            f"max_bins_per_interval must be positive, got {max_bins_per_interval}"
        )
    on = list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(f"left/right column collision: {sorted(overlap)}")

    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        lo = F.floor(F.col(start) / F.lit(bin_size)).cast("long")
        hi = F.floor(F.col(end) / F.lit(bin_size)).cast("long")
        return (
            df.filter(F.col(start) <= F.col(end))
            .filter(hi - lo < F.lit(max_bins_per_interval))
            .withColumn("_bin", F.explode(F.sequence(lo, hi)))
        )

    first_overlap_bin = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / F.lit(bin_size)
    ).cast("long")
    return (
        binned(left, left_start, left_end)
        .join(binned(right, right_start, right_end), [*on, "_bin"])
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col("_bin") == first_overlap_bin)
        )
        .drop("_bin")
    )


def url_change_rate(history: DataFrame, *, url_col: str = "url",
                    ts_col: str = "fetch_ts", hash_col: str = "content_hash",
                    order_tiebreak: str | None = None) -> DataFrame:
    """Recrawl scheduler input — per-URL content change rate from the
    fetch ledger: the crawl-frequency signal every production crawler
    maintains (fast-changing pages get revisited, static pages age out
    of the frontier).

    Per URL over the (ts, tiebreak)-ordered fetch history:

    * ``n_fetches`` — total observations;
    * ``n_changes`` — fetches whose content hash differs from the
      previous fetch (``lag`` over the per-URL window);
    * ``change_rate`` = n_changes / max(n_fetches − 1, 1), rounded 6dp;
    * ``days_stale`` — days from the URL's last fetch to the ledger's
      global max timestamp (one broadcast scalar);
    * ``priority`` = round(change_rate · days_stale, 6) — revisit-next
      ordering: stale AND volatile first.  A product of two exactly-
      derived doubles (no transcendental functions), so both engines
      agree bit-for-bit.

    Scale: one url-keyed window (the per-URL history is short — the
    frontier, not the corpus, is the row count) + one global max
    aggregate broadcast back; shuffle rows are (url, hash, ts) narrow.
    """
    tie = [F.col(order_tiebreak).asc()] if order_tiebreak else []
    w = Window.partitionBy(url_col).orderBy(F.col(ts_col).asc(), *tie)
    changed = (
        history.select(url_col, ts_col, hash_col,
                       *([order_tiebreak] if order_tiebreak else []))
        .withColumn("_prev", F.lag(hash_col).over(w))
        .withColumn(
            "_chg",
            (F.col("_prev").isNotNull()
             & (F.col(hash_col) != F.col("_prev"))).cast("long"),
        )
    )
    per_url = changed.groupBy(url_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        F.sum("_chg").cast("long").alias("n_changes"),
        F.max(ts_col).alias("_last"),
    )
    global_max = history.agg(F.max(ts_col).alias("_gmax"))
    return (
        per_url.crossJoin(F.broadcast(global_max))
        .select(
            F.col(url_col),
            "n_fetches",
            "n_changes",
            F.round(
                F.col("n_changes").cast("double")
                / F.greatest(F.col("n_fetches") - 1, F.lit(1)).cast("double"),
                6,
            ).alias("change_rate"),
            F.round(
                (F.unix_timestamp("_gmax") - F.unix_timestamp("_last"))
                .cast("double") / F.lit(86400.0),
                6,
            ).alias("days_stale"),
        )
        .withColumn(
            "priority", F.round(F.col("change_rate") * F.col("days_stale"), 6)
        )
    )


def crawl_schedule(history: DataFrame, budget: int, *,
                   url_col: str = "url", host_col: str = "host",
                   ts_col: str = "fetch_ts", hash_col: str = "content_hash",
                   order_tiebreak: str | None = None,
                   delays: DataFrame | None = None,
                   cycle_seconds: int | None = None) -> DataFrame:
    """Politeness-aware recrawl scheduling: spend an exact global fetch
    ``budget`` across hosts proportionally to each host's revisit-
    priority mass, then fill each host's quota with its highest-
    priority URLs — the cycle plan a production crawler emits (a
    global top-N ignores politeness and would spend the whole budget
    on one volatile host; a uniform per-host cap ignores volatility).

    Composition of two verified kernels: :func:`url_change_rate`
    (per-URL priority = change_rate · days_stale) and
    ``sampling.proportional_allocation`` (largest-remainder quotas, so
    Σ host quotas == budget EXACTLY; a host holding fewer candidate
    URLs than its quota undersubscribes — the budget is a CEILING, and
    unspent quota signals an exhausted host pool, not an error).  Host
    mass uses integer
    micro-units (``round(priority·10⁶)`` of the already-6dp-rounded
    priority — exact on both engines), so the Hamilton remainder
    ranking never depends on float summation order.

    Returns (url, host, priority, rank_in_host) for the scheduled
    fetches.  Scale: everything after url_change_rate is frontier- or
    hosts-sized; the per-host rank window is quota-cut.

    Host derivation: an optional ``scheme://`` (or protocol-relative
    ``//``) prefix is stripped before the first path segment is taken,
    so ``http://h3/p17``, ``//h3/p17`` and bare ``h3/p17`` all budget
    under host ``h3`` — without the strip every scheme-ful URL would
    collapse into pseudo-host ``http:`` and the politeness budget
    would degenerate to one global pool.

    Crawl-delay capping (``delays`` + ``cycle_seconds``): robots.txt
    Crawl-delay makes a host's PHYSICAL fetch ceiling per cycle
    ``floor(cycle_seconds / crawl_delay_sec)`` — a quota above it is
    unspendable, so each host's Hamilton quota is capped at its
    ceiling (hosts absent from ``delays`` are uncapped).  ``delays``
    is (host, crawl_delay_sec), hosts-sized, broadcast.  Capping
    happens AFTER apportionment: the global budget stays a ceiling and
    the unspent remainder of a slow host signals "raise the cycle or
    drop the host", the operational decision a crawler surfaces rather
    than silently reallocating (re-apportioning freed quota would
    over-fetch hosts whose priority mass said otherwise).
    """
    from sap_data_pipeline_spark.operators.sampling import (
        proportional_allocation,
    )

    host_expr = F.split(
        F.regexp_replace(
            F.col(url_col), r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//", ""
        ),
        "/",
    ).getItem(0)
    rates = url_change_rate(
        history, url_col=url_col, ts_col=ts_col, hash_col=hash_col,
        order_tiebreak=order_tiebreak,
    ).withColumn(host_col, host_expr)
    # The quota branch (host-mass aggregate) and the fill branch
    # (per-host rank) both consume `rates`; without a cut the whole
    # url_change_rate chain — the one history-sized window+aggregate in
    # this operator — executes once per branch (plan audit r13: two
    # full scan→window→agg chains, no ReusedExchange because the
    # branches project differently).  `rates` is frontier-sized (one
    # narrow row per URL), orders of magnitude below the fetch ledger,
    # so materializing it once is the guide's decide-on-the-small-table
    # shape; on a cluster the blocks sit on executors exactly like the
    # graph operators' per-round checkpoints.
    rates, _ = right_size(rates.localCheckpoint(eager=False))  # count materializes
    mass = (
        rates.groupBy(host_col)
        .agg(
            F.sum(F.round(F.col("priority") * 1000000).cast("long"))
            .alias("mass")
        )
        .filter(F.col("mass") > 0)
    )
    quotas = proportional_allocation(
        mass, budget, stratum_col=host_col, n_col="mass"
    ).withColumnRenamed("stratum", host_col)
    if delays is not None:
        if cycle_seconds is None:
            raise ValueError("delays requires cycle_seconds")
        # parse_robots_txt emits one Crawl-delay row per (host, BLOCK),
        # so a multi-group robots.txt yields duplicate host rows here;
        # joining them raw would duplicate quota rows and therefore
        # every scheduled URL for that host.  Collapse to the SLOWEST
        # delay per host (the polite reading of conflicting groups).
        delays = delays.groupBy(host_col).agg(
            F.max("crawl_delay_sec").alias("crawl_delay_sec")
        )
        cap = F.floor(
            F.lit(int(cycle_seconds)) / F.col("crawl_delay_sec")
        ).cast("long")
        quotas = (
            quotas.join(F.broadcast(delays), host_col, "left")
            .select(
                host_col,
                F.when(
                    F.col("crawl_delay_sec").isNotNull(),
                    F.least(F.col("quota"), cap),
                ).otherwise(F.col("quota")).alias("quota"),
            )
        )
    w = Window.partitionBy(host_col).orderBy(
        F.col("priority").desc(), F.col(url_col).asc()
    )
    return (
        rates.withColumn("rank_in_host", F.row_number().over(w))
        .join(F.broadcast(quotas), host_col)
        .filter(F.col("rank_in_host") <= F.col("quota"))
        .select(url_col, host_col, "priority",
                F.col("rank_in_host").cast("int").alias("rank_in_host"))
    )


# ---------------------------------------------------------------------------
# HTTP cache revalidation planning (RFC 9111 freshness model + RFC 9110
# conditional requests — the recrawl cost-saver: a frontier that
# re-fetches unconditionally pays full-body transfer for pages that
# haven't changed; conditional GETs turn those into 304s)
# ---------------------------------------------------------------------------

IMF_FIXDATE_FMT = "EEE, dd MMM yyyy HH:mm:ss 'GMT'"


def http_revalidation_plan(fetch_log: DataFrame, *, now: int,
                           url_col: str = "url") -> DataFrame:
    """Plan the next fetch of each URL from its stored response's
    caching headers, per the RFC 9111 freshness model:

    freshness lifetime (seconds), first match wins:

    1. ``no-store`` / ``no-cache`` in Cache-Control → 0 (never fresh);
    2. ``max-age=N`` (quoted or bare; the token regex anchors on a
       delimiter so extensions like ``x-max-age=5`` never match, and
       ``s-maxage`` doesn't contain the token at all);
    3. ``Expires − Date`` (both IMF-fixdate, RFC 9110 §5.6.7; clamped
       to ≥ 0 — a past Expires means already stale);
    4. the §4.2.2 heuristic: 10% of ``Date − Last-Modified``, capped
       at 24h (the cap is the common production choice; the RFC leaves
       it open);
    5. else 0.

    ``fresh_until = fetched_at + lifetime``; ``is_fresh = now <
    fresh_until``.  The revalidation mode for a stale entry follows
    RFC 9110 §13.1 precedence: ``if-none-match`` when an ETag is
    stored (entity tags are the stronger validator), else
    ``if-modified-since`` when Last-Modified parsed, else
    ``unconditional``; ``no-store`` responses were never storable, so
    their refetch is always ``unconditional``.  Fresh entries plan
    ``fresh`` (no request at all).

    Header dates parse with ``try_to_timestamp`` — a malformed date
    degrades that freshness source to NULL (falling through the
    ladder) instead of killing the job under ANSI mode.  Spark ≥3's
    java.time parser rejects day-of-week text ('EEE') in PARSE
    patterns (formatting only), so the fixed ``Mon, `` prefix is
    stripped first and the remainder parses with the weekday-less
    pattern — IMF-fixdate's weekday is redundant with the date anyway.
    Pure per-row projection: no shuffle, no UDF; at 100 TB this runs
    beside the fetch-log scan.

    Returns (url, freshness_lifetime_sec, fresh_until, is_fresh, mode).
    """
    fmt = F.lit("dd MMM yyyy HH:mm:ss 'GMT'")

    def epoch(col):
        return F.try_to_timestamp(
            F.regexp_replace(F.col(col), r"^[A-Za-z]{3}, ", ""), fmt
        ).cast("long")

    cc = F.coalesce(F.col("cache_control"), F.lit(""))
    no_cache = cc.rlike(r"(?i)(?:^|[,\s])no-(?:cache|store)(?:$|[,;=\s])")
    max_age = F.nullif(
        F.regexp_extract(cc, r'(?i)(?:^|[,\s])max-age="?(\d+)"?', 1),
        F.lit(""),
    ).cast("long")
    d, exp, lm = epoch("date"), epoch("expires"), epoch("last_modified")
    heuristic = F.least(
        F.floor((d - lm) / F.lit(10)).cast("long"), F.lit(86400)
    )
    lifetime = (
        F.when(no_cache, F.lit(0))
        .when(max_age.isNotNull(), max_age)
        .when(
            exp.isNotNull() & d.isNotNull(), F.greatest(exp - d, F.lit(0))
        )
        .when(
            lm.isNotNull() & d.isNotNull() & (d >= lm),
            F.greatest(heuristic, F.lit(0)),
        )
        .otherwise(F.lit(0))
    )
    fresh_until = F.col("fetched_at") + F.col("freshness_lifetime_sec")
    no_store = cc.rlike(r"(?i)(?:^|[,\s])no-store(?:$|[,;=\s])")
    mode = (
        F.when(F.col("is_fresh"), F.lit("fresh"))
        .when(no_store, F.lit("unconditional"))
        .when(
            F.coalesce(F.col("etag"), F.lit("")) != "",
            F.lit("if-none-match"),
        )
        .when(lm.isNotNull(), F.lit("if-modified-since"))
        .otherwise(F.lit("unconditional"))
    )
    return (
        fetch_log.withColumn("freshness_lifetime_sec", lifetime)
        .withColumn("fresh_until", fresh_until)
        .withColumn("is_fresh", F.lit(now) < F.col("fresh_until"))
        .withColumn("mode", mode)
        .select(url_col, "freshness_lifetime_sec", "fresh_until",
                "is_fresh", "mode")
    )


def parse_http_response_head(df: DataFrame, *, head_col: str = "raw_head",
                             url_col: str = "url") -> DataFrame:
    """Parse a raw HTTP/1.x response head (status line + CRLF header
    lines, as a WARC ``response`` record or fetcher log stores it)
    into the typed columns the curation pipeline consumes — the
    producer side of :func:`http_revalidation_plan`.

    RFC 9112 grammar, relationally:

    - obs-fold continuation lines (``CRLF 1*( SP / HTAB )``) are
      unfolded to a single space FIRST (§5.2 says treat as SP), so
      every later regex sees one logical line per field;
    - the status line parses to (status_code, reason); a malformed
      status line degrades both to NULL rather than killing the job;
    - field names match case-insensitively at line starts only — a
      ``Date:`` appearing inside another header's VALUE never matches;
    - single-valued fields (Date, Expires, Last-Modified, ETag,
      Content-Length, Content-Type) take the FIRST occurrence (the
      RFC 9110 §5.3 stance for non-list fields: a sender MUST NOT
      generate duplicates, receivers commonly keep the first);
    - ``Cache-Control`` is LIST-VALUED, so duplicate lines are
      recombined comma-joined per §5.3 — dropping the second line
      would drop directives, the exact bug the recombination rule
      exists to prevent;
    - ``content_type`` is the lowercased media type with parameters
      stripped; ``charset`` is the (quoted or bare) charset parameter
      — the HTTP-layer input to the WHATWG sniff, which BOMs still
      override;
    - ``content_length`` try_casts (junk → NULL under ANSI).

    Zero-shuffle projection; every expression is a native regex over
    the head string.  CRs are deleted after unfolding (CR is illegal
    inside a field value, and RE2 — the oracle engine's regex — does
    not treat a lone ``\\r`` as a line boundary for multiline ``$``,
    so anchoring against CRLF directly would diverge between engines).
    Returns (url, status_code, reason, content_type, charset,
    content_length, etag, last_modified, cache_control, expires,
    date).
    """
    unfolded = F.regexp_replace(
        F.regexp_replace(F.col(head_col), r"\r?\n[ \t]+", " "), r"\r", ""
    )

    def first(name):
        return F.nullif(
            F.regexp_extract(
                unfolded, rf"(?im)^{name}[ \t]*:[ \t]*([^\r\n]*?)[ \t]*$", 1
            ),
            F.lit(""),
        )

    status = F.nullif(
        F.regexp_extract(unfolded, r"(?i)\AHTTP/\d(?:\.\d)? (\d{3})", 1),
        F.lit(""),
    ).cast("int")
    reason = F.nullif(
        F.regexp_extract(
            unfolded,
            r"(?im)\AHTTP/\d(?:\.\d)? \d{3}[ \t]+([^\r\n]*?)[ \t]*$",
            1,
        ),
        F.lit(""),
    )
    ct_raw = first("content-type")
    content_type = F.lower(
        F.nullif(F.regexp_extract(ct_raw, r"^[ \t]*([^;,\s]+)", 1), F.lit(""))
    )
    charset = F.lower(
        F.nullif(
            F.regexp_extract(
                ct_raw, r"""(?i)charset[ \t]*=[ \t]*"?([A-Za-z0-9._:-]+)""", 1
            ),
            F.lit(""),
        )
    )
    cache_control = F.nullif(
        F.array_join(
            F.regexp_extract_all(
                unfolded,
                F.lit(r"(?im)^cache-control[ \t]*:[ \t]*([^\r\n]*?)[ \t]*$"),
                F.lit(1),
            ),
            ", ",
        ),
        F.lit(""),
    )
    return df.select(
        url_col,
        status.alias("status_code"),
        reason.alias("reason"),
        content_type.alias("content_type"),
        charset.alias("charset"),
        first("content-length").try_cast("long").alias("content_length"),
        first("etag").alias("etag"),
        first("last-modified").alias("last_modified"),
        cache_control.alias("cache_control"),
        first("expires").alias("expires"),
        first("date").alias("date"),
    )

"""Text-analysis expression library (training-data-pipeline extensions).

All pure native ``Column`` expressions (JVM-side, codegen-friendly) so
they run at full scan speed over a 100 TB ``documents`` table — no Python
in the hot path.  Used by operators.dedup and the text-stats queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(c: ColumnOrName) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse
    whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(_c(c)), r"\s+", " "))


def tokens(c: ColumnOrName) -> Column:
    """Whitespace/punctuation word tokens (array<string>), empties removed."""
    return F.filter(F.split(normalize_text(c), r"[^\p{L}\p{N}]+"), lambda t: t != "")


def token_count(c: ColumnOrName) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c: ColumnOrName) -> Column:
    """Rough BPE-style token estimate: word-pieces + digits + punctuation
    marks, counted with a GPT-2-like pre-tokenizer regex."""
    pieces = F.regexp_count(_c(c), F.lit(r"\p{L}+|\p{N}|[^\s\p{L}\p{N}]"))
    # ~4 chars/token floor mirrors common BPE heuristics for long words.
    return (pieces + F.floor(F.length(_c(c)) / F.lit(16))).cast("long")


def char_ngrams(c: ColumnOrName, n: int = 5) -> Column:
    """Array of character n-gram shingles of the normalized text.

    Built with ``sequence`` + ``transform`` (no UDF): positions 1..len-n+1,
    each mapped to ``substring``.  The normalized string is BOUND once
    per row (:func:`bind_once`): the body references it in the count and
    in every per-position substring, and the normalize regex chain must
    not re-run per reference.
    """
    def per(s: Column) -> Column:
        count = F.greatest(F.length(s) - F.lit(n - 1), F.lit(0))
        idx = F.sequence(F.lit(1), count)
        return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(idx, lambda i: s.substr(i, F.lit(n)))
        )

    return bind_once(normalize_text(c), per)


def bind_once(col: Column, f) -> Column:
    """Evaluate ``col`` ONCE per row and hand it to ``f`` as a bound
    higher-order-function lambda variable, so ``f``'s body references it
    for free.

    Why this exists (r14 optimization, guide §2.3 "per-task work"):
    Catalyst performs no common-subexpression elimination through
    interpreted higher-order-function chains, so a helper whose body
    mentions its argument k times evaluates an INLINE argument k times
    per row — ``ngrams_from`` over an inline ``tokens(text)`` paid the
    full normalize+split regex chain 3× per row (measured on the sf0.1
    documents scan: 0.61 s inline vs 0.28 s bound; the executed plan
    shows 3 ``regexp_replace``/``split`` instances vs 1).  The
    single-element array wrap and ``element_at`` are O(1) per row.
    Output values are bit-identical — this changes evaluation count,
    never semantics.
    """
    return F.element_at(F.transform(F.array(col), f), 1)


def ngrams_from(t: Column, n: int) -> Column:
    """Array of space-joined n-grams over a token array.

    The body references its argument three times (count, index bound,
    slice source), so the argument is BOUND once per row via
    :func:`bind_once` — an inline tokenizer argument costs one
    evaluation, same as an already-projected column reference.
    """
    def per(tt: Column) -> Column:
        count = F.greatest(F.size(tt) - F.lit(n - 1), F.lit(0))
        idx = F.sequence(F.lit(1), count)
        return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tt, i, n)))
        )

    return bind_once(t, per)


def word_ngrams(c: ColumnOrName, n: int = 3) -> Column:
    """Array of word n-grams (space-joined) over ``tokens``."""
    return ngrams_from(tokens(c), n)


def punct_ratio(c: ColumnOrName) -> Column:
    n = F.length(_c(c))
    p = F.regexp_count(_c(c), F.lit(r"[^\s\p{L}\p{N}]"))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def digit_ratio(c: ColumnOrName) -> Column:
    n = F.length(_c(c))
    d = F.regexp_count(_c(c), F.lit(r"\p{N}"))
    return F.when(n > 0, d.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_word_length_from(t: Column) -> Column:
    """``mean_word_length`` over an ALREADY-COMPUTED token array — the
    projection-tier contract of :func:`ngrams_from`/:func:`repetition_stats`:
    a column reference is free where re-expanding the tokenizer repeats
    the full ``split(trim(regexp_replace(lower(text))))`` regex pass
    (Catalyst does not CSE interpreted higher-order chains)."""
    return F.when(
        F.size(t) > 0,
        F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).cast("double")
        / F.size(t).cast("double"),
    ).otherwise(F.lit(0.0))


def mean_word_length(c: ColumnOrName) -> Column:
    return mean_word_length_from(tokens(c))


# Tiny stopword inventories for the n-gram/stopword language heuristic.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "den"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "una", "por", "con"],
}


def stopword_hits_from(t: Column, lang: str = "en") -> Column:
    """Stopword hit count over an ALREADY-COMPUTED token array."""
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    return F.size(F.filter(t, lambda x: F.array_contains(sw, x)))


def stopword_hits(c: ColumnOrName, lang: str = "en") -> Column:
    """Count of stopword token hits for ``lang``."""
    return stopword_hits_from(tokens(c), lang)


def stopword_ratio_from(t: Column, lang: str = "en") -> Column:
    return F.when(
        F.size(t) > 0,
        stopword_hits_from(t, lang).cast("double") / F.size(t).cast("double"),
    ).otherwise(F.lit(0.0))


def stopword_ratio(c: ColumnOrName, lang: str = "en") -> Column:
    return stopword_ratio_from(tokens(c), lang)


def detect_lang_from(t: Column) -> Column:
    """Heuristic language id over an ALREADY-COMPUTED token array:
    argmax of per-language stopword hits, ``und`` when nothing matches.
    One tokenizer evaluation instead of |languages|."""
    pairs = F.array(*[
        F.struct(stopword_hits_from(t, lang).alias("hits"),
                 F.lit(lang).alias("lang"))
        for lang in _STOPWORDS
    ])
    best = F.array_max(pairs)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def detect_lang(c: ColumnOrName) -> Column:
    """Heuristic language id: argmax of per-language stopword hits,
    ``und`` (undetermined) when nothing matches."""
    return detect_lang_from(tokens(c))


def quality_score_from(c: ColumnOrName, t: Column) -> Column:
    """:func:`quality_score` with the tokenizer HOISTED: ``t`` is an
    already-projected token array (``tokens(text).alias(...)`` in a
    prior select tier), so the stopword and word-length terms reference
    it for free instead of each re-expanding the full tokenize chain —
    the raw-text terms (length/punct/digit) are one cheap
    ``regexp_count`` apiece and stay on ``c``.  Same IEEE arithmetic,
    bit-identical scores."""
    s = _c(c)
    n = F.length(s)
    len_ok = F.when((n >= 100) & (n <= 20000), 1.0).when(n >= 20, 0.5).otherwise(0.0)
    sw_ok = F.least(stopword_ratio_from(t) * 4.0, F.lit(1.0))
    punct_ok = F.when(punct_ratio(c) < 0.2, 1.0).otherwise(0.3)
    digit_ok = F.when(digit_ratio(c) < 0.3, 1.0).otherwise(0.3)
    mwl = mean_word_length_from(t)
    mwl_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.4)
    return F.round((len_ok + sw_ok + punct_ok + digit_ok + mwl_ok) / F.lit(5.0), 4)


def quality_score(c: ColumnOrName) -> Column:
    """Composite [0,1] quality score: length band + stopword presence +
    sane punctuation/digit load + word-length band.  Deterministic,
    documented weights — the point is the shape (pure column expression),
    not the constants.  Hot paths should project ``tokens`` once and use
    :func:`quality_score_from` — this convenience form re-expands the
    tokenizer into every term."""
    return quality_score_from(c, tokens(c))


def top_multiplicity(arr: Column) -> Column:
    """Highest multiplicity of any element in ``arr`` (0 for empty).

    Per-row higher-order expression — O(|distinct|·|arr|) comparisons per
    document, which for natural-language token arrays (hundreds of
    elements) is microseconds of vectorized JVM work and costs NO
    shuffle.  The alternative (explode → groupBy(doc, token) → max) is
    linear but pays two shuffles over the full corpus; at 100 TB the
    shuffle-free form wins until documents reach ~10⁵ tokens.
    """
    counts = F.transform(
        F.array_distinct(arr),
        lambda u: F.size(F.filter(arr, lambda x: x == u)),
    )
    return F.when(F.size(arr) > 0, F.array_max(counts)).otherwise(F.lit(0))


def repetition_stats(tok_col: Column, bigram_col: Column) -> list[Column]:
    """Gopher/C4-style repetition metrics, one pure column expression per
    metric (no shuffle, no UDF):

    * ``dup_word_frac``   — 1 − unique/total words (MassiveText's
      duplicate-word fraction filter)
    * ``top_word_frac``   — share of the most frequent word
    * ``top_bigram_frac`` — share of the most frequent word 2-gram
      (the "fraction of characters in the most common n-gram" family)

    High values flag machine-generated / boilerplate / stuck-sampler text
    that length and stopword filters miss.

    Takes PRE-COMPUTED array columns (``tokens`` / ``ngrams_from``
    aliased in a prior ``select``), not the raw text: the metrics
    reference their array ~10 times, and Catalyst re-expands a repeated
    expression tree per reference — materializing the arrays in their
    own projection tier keeps the tokenizer at one evaluation per row
    (CollapseProject preserves the tier because the aliases are
    non-cheap and multiply-referenced).
    """
    toks, bigrams = _c(tok_col), _c(bigram_col)
    n = F.size(toks).cast("double")
    nb = F.size(bigrams).cast("double")

    def frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, F.round(num.cast("double") / den, 6)).otherwise(
            F.lit(0.0)
        )

    return [
        F.size(toks).cast("long").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_words"),
        frac(n - F.size(F.array_distinct(toks)), n).alias("dup_word_frac"),
        frac(top_multiplicity(toks), n).alias("top_word_frac"),
        frac(top_multiplicity(bigrams), nb).alias("top_bigram_frac"),
    ]


def max_run_chars(arr: Column) -> Column:
    """Max over distinct elements of ``count × char-length`` — the
    "characters contained in the most common n-gram" numerator of the
    Gopher repetition filters (Rae et al. 2021, §A1.1).

    Linear per row: sort the array once, then a single-pass
    ``F.aggregate`` run-length scan (``top_multiplicity``'s
    O(distinct·n) form is fine for token arrays but n-gram arrays grow
    with document length, so this takes the O(n log n) path).  Returns
    0 for empty arrays.  No shuffle, no UDF.
    """
    s = F.array_sort(arr)
    state0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )
    out = F.aggregate(
        s,
        state0,
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                (
                    F.when(g == acc["prev"], acc["run"] + 1)
                    .otherwise(F.lit(1).cast("long"))
                    * F.length(g).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return out


def line_array(c: ColumnOrName) -> Column:
    """Trimmed, non-blank lines of the raw text (array<string>)."""
    return F.filter(
        F.transform(F.split(_c(c), "\n", -1), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def dup_line_stats(lines: Column) -> list[Column]:
    """Gopher line-level repetition metrics over a PRE-COMPUTED line
    array (same projection-tier contract as :func:`repetition_stats`):

    * ``n_lines``             — non-blank line count
    * ``dup_line_frac``       — 1 − distinct/total lines
    * ``dup_line_char_frac``  — chars inside lines occurring ≥2 times
      / total line chars

    The char fraction walks the DISTINCT lines and counts each one's
    occurrences with a nested filter — O(L²) per document, but L (lines
    per doc) is bounded small where n-gram arrays are not, so the
    transparent form wins over a run-length scan here.  No shuffle.
    """
    ls = _c(lines)
    n = F.size(ls)
    tot_chars = F.aggregate(
        ls, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dup_chars = F.aggregate(
        F.array_distinct(ls),
        F.lit(0).cast("long"),
        lambda acc, d: acc
        + F.when(
            F.size(F.filter(ls, lambda x: x == d)) >= 2,
            F.size(F.filter(ls, lambda x: x == d)).cast("long") * F.length(d),
        ).otherwise(F.lit(0).cast("long")),
    )

    def frac(num, den):
        return F.when(den > 0, F.round(num.cast("double") / den.cast("double"), 6)).otherwise(F.lit(0.0))

    return [
        n.cast("long").alias("n_lines"),
        frac(n - F.size(F.array_distinct(ls)), n).alias("dup_line_frac"),
        frac(dup_chars, tot_chars).alias("dup_line_char_frac"),
    ]


def gopher_signals(tok_col: Column, line_col: Column,
                   text_col: ColumnOrName = "text") -> tuple[dict, dict]:
    """The Gopher/MassiveText rule battery (Rae et al. 2021, §A1.1) as
    reusable Column expressions over PRE-COMPUTED token/line arrays
    (same projection-tier contract as :func:`repetition_stats`).

    Returns ``(signals, gates)``: signals = {name: unrounded Column}
    (word count, mean word length, symbol-to-word, alpha-word
    fraction, distinct stopwords, bullet/ellipsis line fractions);
    gates = {flag name: BooleanColumn}.  Every gate compares exact
    counts or IEEE divisions of exact counts, so engines decide each
    bit identically.  ONE definition shared by the catalog query and
    the pipeline gate — the rule battery can't fork.
    """
    t, l = tok_col, line_col
    nt, nl = F.size(t).cast("double"), F.size(l).cast("double")

    def ratio(num, den):
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    n_words = F.size(t).cast("long")
    mwl = ratio(
        F.aggregate(t, F.lit(0).cast("long"), lambda a, x: a + F.length(x)), nt
    )
    symr = ratio(F.regexp_count(_c(text_col), F.lit(r"(#|\.\.\.|…)")), nt)
    alphaf = ratio(F.size(F.filter(t, lambda x: x.rlike(r"\p{L}"))), nt)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    n_stop = F.size(
        F.array_distinct(F.filter(t, lambda x: F.array_contains(sw, x)))
    ).cast("long")
    bulletf = ratio(F.size(F.filter(l, lambda x: x.rlike(r"^[-*•]"))), nl)
    ellf = ratio(F.size(F.filter(l, lambda x: x.rlike(r"(\.\.\.|…)$"))), nl)

    signals = {
        "n_words": n_words,
        "mean_word_len": mwl,
        "symbol_word_ratio": symr,
        "alpha_word_frac": alphaf,
        "n_stop": n_stop,
        "bullet_line_frac": bulletf,
        "ellipsis_line_frac": ellf,
    }
    gates = {
        "flag_words": (n_words >= 50) & (n_words <= 100000),
        "flag_mwl": (mwl >= 3.0) & (mwl <= 10.0),
        "flag_symbols": symr <= 0.1,
        "flag_alpha": alphaf >= 0.8,
        "flag_stopwords": n_stop >= 2,
        "flag_bullets": bulletf <= 0.9,
        "flag_ellipsis": ellf <= 0.3,
    }
    return signals, gates


ROLLING_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
ROLLING_BASE = 31


def rolling_fingerprint(c: ColumnOrName) -> Column:
    """Polynomial rolling-hash fingerprint of the normalized text:
    ``h = (h*31 + codepoint) mod (2^31-1)`` over the characters.

    Pure JVM fold (``transform`` + ``aggregate``), no UDF; the DuckDB twin
    (``list_reduce`` over the same codepoints) is bit-identical — the
    intermediate never exceeds 2^36, so both engines stay in exact int64.
    """
    s = normalize_text(c)
    codes = F.transform(
        F.sequence(F.lit(1), F.length(s)), lambda i: F.ascii(s.substr(i, F.lit(1)))
    )
    folded = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(ROLLING_BASE) + x) % F.lit(ROLLING_MOD),
    )
    return F.when(F.length(s) == 0, F.lit(0).cast("long")).otherwise(folded)


# PII patterns — deliberately limited to syntax both Java regex (Spark)
# and RE2 (DuckDB oracle) interpret identically: character classes, \d,
# \b, bounded quantifiers; no lookarounds or backreferences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def redact_pii(c: ColumnOrName) -> Column:
    """Redact emails / SSNs / US phone numbers with typed placeholders.

    Pure chained ``regexp_replace`` (JVM-side, replaces all matches) —
    the corpus-scrub pass a training-data pipeline runs over every
    document, so it must stay in whole-stage codegen.  SSN before phone:
    the patterns are disjoint (2- vs 3-digit middle group) but ordering
    makes the contract explicit.
    """
    out = F.regexp_replace(_c(c), EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, SSN_RE, "<SSN>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_counts(c: ColumnOrName) -> list[Column]:
    """Match counts per PII class (audit columns for the scrub pass)."""
    return [
        F.regexp_count(_c(c), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(_c(c), F.lit(SSN_RE)).alias("n_ssn"),
        F.regexp_count(_c(c), F.lit(PHONE_RE)).alias("n_phones"),
    ]


def md5_fingerprint(c: ColumnOrName) -> Column:
    """Exact-dup fingerprint: md5 of the normalized text (portable — the
    DuckDB oracle computes the identical value)."""
    return F.md5(normalize_text(c))


def hash64(c: ColumnOrName, seed: int = 0) -> Column:
    """Portable deterministic 64-bit hash of a string: first 16 hex chars
    of md5(seed‖value) as a signed big-endian long.  Chosen over
    ``xxhash64`` because md5 is bit-identical in DuckDB, keeping the
    minhash/simhash oracles SQL-expressible."""
    h = F.md5(F.concat(F.lit(f"s{seed}:"), _c(c)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


# HTML entity decode order matters: '&amp;' must decode LAST or
# '&amp;lt;' would double-decode into '<'.  Plain replace() (not regex)
# on both engines.
HTML_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
]


def extract_text_html(c: ColumnOrName) -> Column:
    """Web-scrape text extraction: drop script/style blocks, strip tags,
    decode the common entities, collapse whitespace — the HTML→text
    stage in front of every corpus filter.  Chained ``regexp_replace``
    + ``replace`` stays inside whole-stage codegen; the identical chain
    is SQL-expressible (RE2-safe: no backreferences — script and style
    blocks are two separate patterns), so the operator carries a full
    value-hash oracle."""
    s = F.regexp_replace(_c(c), r"(?s)<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, r"(?s)<style[^>]*>.*?</style>", " ")
    s = F.regexp_replace(s, r"<[^>]+>", " ")
    for ent, rep in HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


# XML entity decoding (sitemaps protocol: URLs in <loc> MUST be
# entity-escaped, so '?a=1&b=2' arrives as '?a=1&amp;b=2'; a seeded
# frontier URL that keeps '&amp;' verbatim never joins against the
# same URL from href extraction or fetch logs).  Single-pass by
# construction: a sentinel is inserted before every '&', the string is
# split on it, and each part decodes AT MOST its leading reference —
# so '&amp;#38;' decodes to '&#38;' and stops, never cascading the
# way chained global replaces would.
_XML_SENT = "\x01"  # never legal in a URL or XML text node


def xml_unescape(c: ColumnOrName) -> Column:
    """Decode the five XML named entities (&amp; &lt; &gt; &quot;
    &apos;) plus decimal (&#47;) and hex (&#x2F;) numeric character
    references in the printable-ASCII range 32-126 — the only range
    where Spark's ``char`` and DuckDB's ``chr`` agree, and the only
    range a sitemaps-protocol URL legally needs (non-ASCII must be
    percent-encoded before entity-escaping).  Out-of-range or
    malformed references pass through verbatim — degrade, never
    throw.  The DuckDB twin is the catalog's ``_xml_unescape_sql``;
    both emit identical strings by construction."""
    def _decode(p: Column) -> Column:
        dec = F.regexp_extract(p, r"^&#([0-9]{1,7});", 1)
        hx = F.regexp_extract(p, r"^&#[xX]([0-9a-fA-F]{1,6});", 1)
        code = F.coalesce(
            F.when(dec != "", dec.try_cast("int")),
            F.when(hx != "", F.conv(hx, 16, 10).try_cast("int")),
        )
        num_rest = F.regexp_replace(
            p, r"^&#(?:[0-9]{1,7}|[xX][0-9a-fA-F]{1,6});", ""
        )
        return (
            F.when(p.startswith("&amp;"),
                   F.concat(F.lit("&"), p.substr(F.lit(6), F.length(p))))
            .when(p.startswith("&lt;"),
                  F.concat(F.lit("<"), p.substr(F.lit(5), F.length(p))))
            .when(p.startswith("&gt;"),
                  F.concat(F.lit(">"), p.substr(F.lit(5), F.length(p))))
            .when(p.startswith("&quot;"),
                  F.concat(F.lit('"'), p.substr(F.lit(7), F.length(p))))
            .when(p.startswith("&apos;"),
                  F.concat(F.lit("'"), p.substr(F.lit(7), F.length(p))))
            .when((code >= 32) & (code <= 126),
                  F.concat(F.char(code), num_rest))
            .otherwise(p)
        )

    parts = F.split(
        F.replace(_c(c), F.lit("&"), F.lit(_XML_SENT + "&")), _XML_SENT
    )
    return F.array_join(F.transform(parts, _decode), "")


def percent_normalize_url(c: ColumnOrName) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization — the dedup/join
    parity step :func:`canonicalize_url` deliberately does not do:
    ``%2f`` and ``%2F`` are the SAME octet, and ``%7Euser`` is the same
    path as ``~user``, but string equality sees four different URLs.
    Per the RFC: uppercase the hex digits of every percent triplet
    (§6.2.2.1) and fully decode triplets encoding UNRESERVED characters
    (ALPHA / DIGIT / ``-._~``, §6.2.2.2) — decoding anything else
    (e.g. ``%2F``) would CHANGE the URL, so those stay encoded.
    Malformed ``%`` sequences (not followed by two hex digits) pass
    through verbatim — degrade, never throw.

    Same sentinel-split single-pass construction as
    :func:`xml_unescape`; the DuckDB twin is the catalog's
    ``_pct_norm_sql``.
    """
    def _decode(p: Column) -> Column:
        hx = F.regexp_extract(p, r"^%([0-9a-fA-F]{2})", 1)
        code = F.conv(hx, 16, 10).try_cast("int")
        rest = F.regexp_replace(p, r"^%[0-9a-fA-F]{2}", "")
        unreserved = (
            ((code >= 48) & (code <= 57))      # DIGIT
            | ((code >= 65) & (code <= 90))    # ALPHA upper
            | ((code >= 97) & (code <= 122))   # ALPHA lower
            | code.isin(45, 46, 95, 126)       # - . _ ~
        )
        return (
            F.when(hx == "", p)  # no/malformed triplet: verbatim
            .when(unreserved, F.concat(F.char(code), rest))
            .otherwise(F.concat(F.lit("%"), F.upper(hx), rest))
        )

    parts = F.split(
        F.replace(_c(c), F.lit("%"), F.lit(_XML_SENT + "%")), _XML_SENT
    )
    return F.array_join(F.transform(parts, _decode), "")


# URL component extraction — one regex per component, identical on both
# engines (Spark's parse_url has engine-specific NULL semantics; these
# are plain regexp_extract on both sides).
URL_HOST_RE = r"^https?://([^/?#]+)"
URL_PATH_RE = r"^https?://[^/?#]+([^?#]*)"


def url_host(c: ColumnOrName) -> Column:
    return F.regexp_extract(_c(c), URL_HOST_RE, 1)


def url_path(c: ColumnOrName) -> Column:
    return F.regexp_extract(_c(c), URL_PATH_RE, 1)


def url_query_param(c: ColumnOrName, name: str) -> Column:
    return F.regexp_extract(_c(c), rf"[?&]{name}=([^&#]*)", 1)


def canonicalize_url(c: ColumnOrName) -> Column:
    """Canonical URL form for crawl dedup — the variations that make one
    page look like many: fragment stripped, tracking params removed
    (``utm_*``/``gclid``/``fbclid``, the lowercase convention), dangling
    ``?``/``&`` cleaned, default ports dropped (``:80`` for http,
    ``:443`` for https), scheme+authority lowercased (path case is
    preserved — it is significant), trailing slash removed.

    Pure regexp_replace/extract chain (whole-stage codegen, no UDF);
    every regex is RE2-compatible so the DuckDB oracle replays the
    identical transforms (replacement backref syntax differs — ``$1``
    vs ``\\1`` — but the OUTPUT strings are verified byte-identical by
    the ``url_canonical_dedup`` hash oracle).
    """
    u = _c(c)
    u = F.regexp_replace(u, "#.*$", "")
    # Tracking params must be anchored on a [?&] separator (kept via $1)
    # or the pattern matches MID-TOKEN: the unanchored r10 form turned
    # `?myutm_a=1` into `?my`, conflating distinct URLs, while
    # `?UTM_SOURCE=x` survived (ADVICE r10).  The repeated inner group
    # strips RUNS of consecutive tracking params in one match — with a
    # single-param pattern the replacement consumes the `&` that the
    # next param needs as its own anchor and leaves it behind.
    u = F.regexp_replace(
        u, r"(?i)([?&])((utm_[a-z]+|gclid|fbclid)=[^&]*&?)+", "$1"
    )
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, "[?&]$", "")
    u = F.regexp_replace(u, "(?i)^(http://[^/:]+):80(/|$)", "$1$2")
    u = F.regexp_replace(u, "(?i)^(https://[^/:]+):443(/|$)", "$1$2")

    # the scheme+authority lowercasing references the replace-chain
    # prefix (u) twice and the extracted head twice — bind each once per
    # row (:func:`bind_once`) or the whole 5-regex prefix re-expands per
    # reference: the executed plan carried 19 regexp_replace instances
    # per row, ~3 evaluations of the chain, now 7 (r14; same defect
    # class as ngrams_from)
    def lower_head(uu: Column) -> Column:
        return bind_once(
            F.regexp_extract(uu, "(?i)^(https?://[^/]+)", 1),
            lambda head: F.concat(
                F.lower(head),
                F.substring(uu, F.length(head) + 1, F.lit(1 << 30)),
            ),
        )

    return F.regexp_replace(bind_once(u, lower_head), "/$", "")


# ---------------------------------------------------------------------------
# Code-vs-prose detection — the routing signal every mixed web corpus
# needs before training: code documents go to code-specific processing
# (permissive-license filters, AST dedup, language tagging) while prose
# rides the text-quality pipeline.  All pure Column expressions
# (regexp_count / length arithmetic, whole-stage codegen); every regex
# is RE2-compatible so the DuckDB oracle replays them verbatim.
# ---------------------------------------------------------------------------

# whole-word keywords shared by the big languages; fixed list = part of
# the detector's contract (mirrored in the SQL twin)
CODE_KEYWORD_RE = (
    r"\b(def|class|import|return|function|var|const|let|if|else|for|"
    r"while|public|private|static|void|int|float|struct|enum|lambda|"
    r"print|printf|println)\b"
)
CODE_SYMBOL_RE = r"[{}\[\]();=<>]"
INDENT_LINE_RE = r"(?m)^(?:    |\t)"


def code_signals(c: ColumnOrName) -> dict[str, Column]:
    """Raw code-likeness signals for one text column:

    - ``n_chars`` / ``n_lines`` — sizes (lines = newline count + 1);
    - ``sym_hits`` — structural symbol count (braces/brackets/
      parens/semicolons/operators), the densest code giveaway;
    - ``kw_hits`` — whole-word hits on a fixed cross-language keyword
      list;
    - ``indent_lines`` — lines starting with 4 spaces or a tab (block
      indentation, the prose-rarest signal).
    """
    t = _c(c)
    return {
        "n_chars": F.length(t).cast("long"),
        "n_lines": (F.regexp_count(t, F.lit(r"\n")) + F.lit(1)).cast("long"),
        "sym_hits": F.regexp_count(t, F.lit(CODE_SYMBOL_RE)).cast("long"),
        "kw_hits": F.regexp_count(t, F.lit(CODE_KEYWORD_RE)).cast("long"),
        "indent_lines": F.regexp_count(t, F.lit(INDENT_LINE_RE)).cast("long"),
    }


def is_code_verdict(s: dict[str, Column]) -> Column:
    """Routing verdict over :func:`code_signals` — exact integer
    cross-multiplication (no float thresholds, so both engines agree
    bit-for-bit): code iff at least TWO of

    - symbol density  ≥ 4%   (100·sym_hits ≥ 4·n_chars)
    - keyword density ≥ 1 per 100 chars (100·kw_hits ≥ n_chars)
    - indented lines  ≥ 20%  (5·indent_lines ≥ n_lines)
    """
    votes = (
        (s["sym_hits"] * 100 >= s["n_chars"] * 4).cast("int")
        + (s["kw_hits"] * 100 >= s["n_chars"]).cast("int")
        + (s["indent_lines"] * 5 >= s["n_lines"]).cast("int")
    )
    return votes >= F.lit(2)


def hashed_gram_buckets(t: Column, *, n_buckets: int, seed: int = 5,
                        include_bigrams: bool = True,
                        production: bool = False) -> Column:
    """Hashing-trick feature map (fastText / CCNet linear-filter style,
    public): every token — and optionally every word bigram — hashes
    into one of ``n_buckets`` buckets, so the feature space is
    FIXED-width regardless of vocabulary.  Takes an ALREADY-COMPUTED
    token array (projection-tier contract).

    Two hash paths, same pipeline otherwise (grams → hash → pmod →
    int bucket):

    * default — the portable seeded-md5 :func:`hash64`, bit-identical
      in DuckDB, which is what keeps the ``hashed_ngram_score`` oracle
      SQL-expressible;
    * ``production=True`` — JVM ``xxhash64`` (one codegen'd hash per
      gram instead of an md5 digest + hex-substring + conv chain,
      measured ~5× cheaper per gram at 20×, SCALE.md).  No DuckDB
      twin exists, so oracle queries keep the md5 path; the
      bucket-independent arithmetic is pinned equal across paths by
      ``test_hashed_ngram_production_path``.

    Returns array<int> of bucket ids, one per gram, order preserved
    (multiplicity carries the count weight downstream).
    """
    grams = F.concat(t, ngrams_from(t, 2)) if include_bigrams else t
    if production:
        return F.transform(
            grams,
            lambda g: F.pmod(F.xxhash64(F.lit(seed), g),
                             F.lit(n_buckets)).cast("int"),
        )
    return F.transform(
        grams, lambda g: F.pmod(hash64(g, seed=seed), F.lit(n_buckets)).cast("int")
    )


def hashed_linear_score_from(buckets: Column, weights: list[float]) -> Column:
    """Length-normalized linear score over ALREADY-COMPUTED hashed gram
    buckets — the serving arithmetic of a fastText-style quality filter
    with FROZEN weights (the fixed-model precedent: training is out of
    scope here, the hashing-trick feature map + dot product is what
    must be bit-reproducible at corpus scale).  ``weights[b]`` is the
    bucket-b weight, shipped as one array literal; ``buckets`` should
    be an aliased projection-tier column so the gram-hash chain is
    evaluated once per row.

    score = Σ_g weights[bucket(g)] / n_grams, a sequential left fold
    (both engines sum in list order → identical IEEE result), rounded
    6dp; empty token arrays score 0.0.
    """
    w_lit = F.array(*[F.lit(float(w)) for w in weights])
    total = F.aggregate(
        buckets, F.lit(0.0),
        lambda acc, b: acc + F.element_at(w_lit, b + F.lit(1)),
    )
    return F.when(
        F.size(buckets) > 0,
        F.round(total / F.size(buckets).cast("double"), 6),
    ).otherwise(F.lit(0.0))


def hashed_linear_score(t: Column, weights: list[float], *,
                        seed: int = 5) -> Column:
    """Convenience form of :func:`hashed_linear_score_from` over a token
    array — re-expands the gram-hash chain; hot paths should project
    :func:`hashed_gram_buckets` once and use the ``_from`` variant."""
    return hashed_linear_score_from(
        hashed_gram_buckets(t, n_buckets=len(weights), seed=seed), weights
    )

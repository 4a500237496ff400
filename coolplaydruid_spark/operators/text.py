"""Text analysis operators over a document table: tokenization, token
counting, quality scoring, language ID (n-gram/stopword heuristic),
document fingerprinting.

Design rules:
 - Everything is built-in Spark SQL expressions (split/regexp/aggregate) —
   whole-stage codegen, no Python in the hot path, embarrassingly
   parallel (no shuffle at all: one projection over the scan).
 - Every formula is deterministic and expressible in ANSI-ish SQL so the
   DuckDB oracle can mirror it exactly.

At 100 TB these run as a single map-only pass over the corpus — the cost
is the scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from coolplaydruid_spark.operators.util import spread

# ASCII punctuation as an explicit class (identical semantics in Java
# regex and RE2, unlike [[:punct:]]).
PUNCT_CLASS = r"[!-/:-@\[-`{-~]"
DIGIT_CLASS = r"[0-9]"
# BPE-ish pre-tokenizer: letter runs | single digits | punctuation marks
BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# Tiny distinctive-stopword lists for the language-ID heuristic. The
# scoring is a plain weighted token-match count — deterministic and
# SQL-mirrorable. Script detection (CJK/Thai/Cyrillic/...) short-circuits
# before stopwords.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que"],
    "es": ["el", "los", "las", "es", "una", "con", "por", "para"],
}
SCRIPT_RANGES = [  # (lang, Java-regex char class)
    ("zh", "[一-鿿]"),
    ("ja", "[぀-ヿ]"),
    ("ko", "[가-힯]"),
    ("th", "[฀-๿]"),
    ("ru", "[Ѐ-ӿ]"),
    ("ar", "[؀-ۿ]"),
    ("hi", "[ऀ-ॿ]"),
]


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased text (empty array for empty
    input)."""
    t = F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), r"\s+")
    return F.filter(t, lambda x: x != "")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish piece count (letter runs, single
    digits, punctuation marks) — the two standard corpus-size estimators."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), 0)).cast("long").alias("bpe_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    length, punctuation/digit density, mean token length, stopword ratio.
    The exact formula is part of the operator contract (mirrored by the
    oracle): score = 0.25*len_norm + 0.25*(1-punct_ratio) +
    0.25*(1-digit_ratio) + 0.25*stopword_ratio."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(F.col(text_col))
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    digits = n_chars - F.length(F.regexp_replace(text, DIGIT_CLASS, ""))
    stop = F.size(F.filter(toks, lambda t: t.isin(LANG_STOPWORDS["en"])))
    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    len_norm = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_ratio = safe(punct, n_chars)
    digit_ratio = safe(digits, n_chars)
    stop_ratio = safe(stop, n_tokens)
    mean_tok = safe(F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)), n_tokens)
    score = (
        0.25 * len_norm + 0.25 * (1 - punct_ratio) + 0.25 * (1 - digit_ratio)
        + 0.25 * stop_ratio
    )
    return spread(df, by=id_col).select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID. Script ranges short-circuit (a single CJK /
    Thai / Cyrillic … character decides); otherwise the language with the
    highest distinctive-stopword hit count wins (ties broken by the fixed
    order en > de > fr > es; no hits → 'und')."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(F.col(text_col))

    # NB: higher-order-function lambdas must take exactly one parameter —
    # PySpark inspects arity and passes the array index for 2-arg lambdas.
    def _hits(words):
        return lambda t: t.isin(words)

    s = {
        lang: F.size(F.filter(toks, _hits(words)))
        for lang, words in LANG_STOPWORDS.items()
    }
    # Priority-ordered argmax as a CASE chain (each branch: positive score
    # and >= every lower-priority score) — mirrors 1:1 into oracle SQL.
    guess = (
        F.when((s["en"] > 0) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), "en")
        .when((s["de"] > 0) & (s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
        .when((s["fr"] > 0) & (s["fr"] >= s["es"]), "fr")
        .when(s["es"] > 0, "es")
        .otherwise("und")
    )
    for lang, cls in reversed(SCRIPT_RANGES):
        guess = F.when(text.rlike(cls), F.lit(lang)).otherwise(guess)
    return spread(df, by=id_col).select(F.col(id_col), guess.alias("lang_guess"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Two document fingerprints:
     - exact_md5: md5 of the raw text (byte-identical dup detection)
     - shuffle_md5: md5 of the sorted distinct token set — invariant to
       word order and repetition (the classic 'fingerprint' key used for
       near-dup clustering at ingest)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    sorted_toks = F.array_sort(F.array_distinct(tokens(F.col(text_col))))
    return df.select(
        F.col(id_col),
        F.md5(text).alias("exact_md5"),
        F.md5(F.concat_ws(" ", sorted_toks)).alias("shuffle_md5"),
    )


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — i.e.
    the count of the most frequent element — as a single fold, no
    explode/shuffle. Empty array → 0."""
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals, per document:
     - n_tokens: whitespace token count
     - distinct_token_ratio: |distinct tokens| / n_tokens (type-token
       ratio; low = repetitive boilerplate)
     - top_token_frac: share of the single most frequent token
     - top_bigram_frac: share of the most frequent bigram among bigrams

    Documents dominated by one token/bigram are machine-generated or
    boilerplate — these are the standard repetition filters a pretraining
    cleanup applies after dedup.

    100 TB shape: map-only — the most-frequent-element count is a fold
    over the SORTED token/bigram array (longest equal run), so there is
    no explode, no groupBy, no shuffle; the cost is the scan. An empty
    document yields zeros."""
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__toks"))
    t = F.col("__toks")
    n = F.size(t)
    # bigram array (empty when < 2 tokens), built from the bound column
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams)
    frac = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den, 6)
    ).otherwise(F.lit(0.0))
    return base.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        frac(F.size(F.array_distinct(t)), n).alias("distinct_token_ratio"),
        frac(_max_run(F.array_sort(t)), n).alias("top_token_frac"),
        frac(_max_run(F.array_sort(grams)), n_grams).alias("top_bigram_frac"),
    )


def contamination_check(
    docs: DataFrame,
    probes: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str = "text",
) -> DataFrame:
    """Training-data decontamination: flag corpus documents sharing any
    k-gram shingle with a probe (benchmark/eval) set. Returns
    (id_col, n_contaminated) — one row per flagged document with its
    count of distinct probe-overlapping shingles.

    Plan shape for 100 TB: the probe side collapses to a DISTINCT
    shingle set (benchmark-sized — thousands of docs, always tiny next
    to a training corpus) and BROADCASTS; the corpus streams through one
    map + broadcast-hash-join + partial-agg pass — the corpus is never
    shuffled by shingle. Real pipelines run exactly this shape (e.g.
    13-gram decontamination); k is a parameter because the fixture's
    short documents need smaller grams to exercise hits."""
    from coolplaydruid_spark.operators.dedup import shingles

    probe_sh = (
        shingles(probes, k=k, text_col=probe_text_col, id_col=id_col)
        .select("shingle")
        .distinct()
    )
    doc_sh = shingles(docs, k=k, text_col=text_col, id_col=id_col)
    return (
        doc_sh.join(F.broadcast(probe_sh), on="shingle", how="inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated"))
    )


def contamination_fraction(
    docs: DataFrame,
    probes: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str = "text",
) -> DataFrame:
    """Per-document contamination RATIO against a probe set: the
    fraction of the document's distinct k-gram shingles that appear in
    any probe document — the number an eval-decontamination policy
    thresholds on (drop at ≥ x%, flag at ≥ y%), where the raw count
    (contamination_check) can't distinguish a 2000-shingle doc with 3
    hits from a 6-shingle doc with 3 hits. Returns one row per document
    WITH shingles: (id, n_shingles, contaminated_frac rounded 6) —
    uncontaminated docs report 0.0.

    Same scale shape as contamination_check (broadcast probe shingles,
    corpus never shuffled by shingle) plus the per-doc size aggregation,
    which shares the one shingle projection: total and hit counts come
    out of a single conditional-aggregation pass — not a second corpus
    scan or a count-join."""
    from coolplaydruid_spark.operators.dedup import shingles

    probe_sh = (
        shingles(probes, k=k, text_col=probe_text_col, id_col=id_col)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    doc_sh = shingles(docs, k=k, text_col=text_col, id_col=id_col)
    joined = doc_sh.join(F.broadcast(probe_sh), on="shingle", how="left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.round(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            / F.count(F.lit(1)),
            6,
        ).alias("contaminated_frac"),
    )


# Control characters to strip during normalization: C0 controls minus
# tab/newline/carriage-return (which whitespace-collapse handles), plus
# DEL. Identical hex-escape classes in Java regex and RE2.
CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_text(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Canonical text cleanup for ingest: strip C0 control characters
    (keeping tab/newline for the collapse step), collapse every
    whitespace run to a single space, trim. Returns (id, norm_text,
    norm_chars, norm_md5) — the digest keys downstream exact dedup so
    byte-noise variants of the same document collapse.

    Map-only, whole-stage codegen (two regexp_replace + trim) — at
    100 TB the cost is the scan."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    stripped = F.regexp_replace(text, CONTROL_CLASS, "")
    collapsed = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return df.select(
        F.col(id_col),
        collapsed.alias("norm_text"),
        F.length(collapsed).cast("long").alias("norm_chars"),
        F.md5(collapsed).alias("norm_md5"),
    )


# Alphabet over which char_entropy measures the character distribution.
# A FIXED alphabet (not "all chars present") keeps the operator a pure
# per-row expression — counting arbitrary chars needs a per-row frequency
# map, which Spark SQL cannot build without explode (a corpus-of-chars
# shuffle) or Python. Characters outside the alphabet are ignored.
ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def char_entropy(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 alphabet: str = ENTROPY_ALPHABET) -> DataFrame:
    """Shannon entropy (bits/char) of each document's character
    distribution over a fixed alphabet — the classic cheap gibberish
    detector: natural English sits ~4.0-4.2 bits over [a-z0-9 ],
    single-char spam near 0, uniform random near log2(37)≈5.2.
    Returns (id, char_entropy) rounded to 6.

    Per-char counts are length-difference expressions
    (length(t) - length(replace(t, c))), one per alphabet char —
    map-only, whole-stage codegen, no shuffle, no Python; the counts
    are materialized once in a lower projection so the entropy
    expression references them, not |alphabet|² replace scans.
    Documents with no in-alphabet characters score 0."""
    text = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    names = [f"__c{i}" for i in range(len(alphabet))]
    counted = df.select(
        F.col(id_col),
        *[
            (F.length(text) - F.length(F.replace(text, F.lit(ch))))
            .cast("double")
            .alias(nm)
            for nm, ch in zip(names, alphabet)
        ],
    )
    total = sum(F.col(nm) for nm in names)
    with_total = counted.select(F.col(id_col), *names, total.alias("__t"))
    p = lambda nm: F.col(nm) / F.col("__t")  # noqa: E731
    term = lambda nm: F.when(  # noqa: E731
        F.col(nm) > 0, -p(nm) * F.log2(p(nm))
    ).otherwise(F.lit(0.0))
    ent = F.when(F.col("__t") > 0, sum(term(nm) for nm in names)).otherwise(
        F.lit(0.0)
    )
    return with_total.select(
        F.col(id_col), F.round(ent, 6).alias("char_entropy")
    )


def unigram_logprob_score(df: DataFrame, vocab_size: int | None = None,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          cache: bool = False) -> DataFrame:
    """Per-document mean negative log2 probability of its tokens under
    the corpus's own empirical unigram distribution — the cheap
    LM-perplexity proxy (the CCNet-style quality ranking): documents of
    common, corpus-typical words score low; rare-word soup and
    vocabulary outliers score high. Returns (id, n_tokens,
    nll_per_token) for documents with ≥ 1 token.

    ``vocab_size`` caps the model to the top-V tokens by corpus count
    (ties broken lexicographically — deterministic across engines);
    out-of-vocabulary tokens take the floor probability 1/T where T is
    the total corpus token count (count-1 smoothing).

    Scale: the token-keyed counts aggregation uses map-side combine
    (each executor emits its distinct tokens once); the top-V cut is a
    TakeOrderedAndProject over the (vocabulary-cardinality) counts
    table; the probability join broadcasts the vocab — bounded by the
    V parameter, not the data — so the corpus-of-tokens side never
    reshuffles for it; the per-doc aggregation is the second and last
    data-sized shuffle, with partial-avg map-side combine. The
    tokenized corpus feeds both the counts subtree and the join's
    probe side — two scan+tokenize passes per action (the counts
    exchange is shared by vocab and total via AQE exchange reuse);
    ``cache=True`` persists the exploded tokens to make it one, when
    memory beats the re-scan at the deployment's scale."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    if cache:
        toks = toks.persist()
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__c"))
    total = counts.agg(F.sum("__c").cast("double").alias("__T"))
    if vocab_size is not None:
        # bounded by the V parameter → broadcast is safe by construction
        vocab = F.broadcast(
            counts.orderBy(F.col("__c").desc(), F.col("tok").asc()).limit(
                int(vocab_size)
            )
        )
    else:
        # full vocabulary scales with the corpus — leave the join
        # strategy to AQE (broadcast when runtime stats allow, shuffle
        # join otherwise), per the no-forced-broadcast-on-data-scaled-
        # tables rule (SCALE.md).
        vocab = counts
    p = F.coalesce(F.col("__c"), F.lit(1)).cast("double") / F.col("__T")
    return (
        toks.join(vocab, on="tok", how="left")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg(-F.log2(p)), 6).alias("nll_per_token"),
        )
    )


# Fixed token-length histogram boundaries (right-open buckets). A CASE
# chain — not log/pow arithmetic — so both engines bucket identically
# with zero FP edge cases.
LENGTH_BUCKETS = [0, 10, 30, 100, 300, 1000, 3000, 10000]


def length_histogram(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Corpus length profile: documents histogrammed by whitespace token
    count into fixed right-open buckets ([0,10), [10,30), ... [10000,∞)).
    Returns (bucket_lo, n_docs, total_tokens) — the standard
    sequence-length planning input for context-window and packing
    decisions.

    One map (token count + CASE bucket) and one tiny aggregation keyed
    on ≤ 8 bucket values; partial aggregation collapses each executor's
    output to bucket-cardinality rows before the exchange."""
    n = F.size(tokens(F.col(text_col)))
    bucket = F.lit(LENGTH_BUCKETS[-1]).cast("long")
    for lo, hi in zip(LENGTH_BUCKETS, LENGTH_BUCKETS[1:]):
        bucket = F.when((n >= lo) & (n < hi), F.lit(lo).cast("long")).otherwise(bucket)
    return (
        df.select(bucket.alias("bucket_lo"), n.alias("__n"))
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__n").cast("long").alias("total_tokens"),
        )
    )


def bigram_logprob_score(df: DataFrame, vocab_size: int = 100,
                         bigram_size: int = 300, lam: float = 0.7,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Interpolated bigram LM quality proxy — the next step up from
    unigram_logprob_score toward the CCNet KenLM ranking: per document,
    the mean -log2 of λ·p(tokᵢ | tokᵢ₋₁) + (1−λ)·p(tokᵢ) under the
    corpus's own capped bigram/unigram models. Documents whose word
    ORDER is corpus-typical score low; shuffled or templated text with
    plausible unigrams but improbable transitions scores high — a
    signal unigram NLL is blind to. Returns (id, n_pairs,
    nll_per_pair) for documents with ≥ 2 tokens.

    Model (the exact formula is the operator contract, mirrored by the
    oracle): p_bi(pair) = c(pair) / c(first-token-of-pair over pair
    STARTS), kept for the top-``bigram_size`` pairs by (count DESC,
    pair ASC); absent pairs contribute 0 to the interpolation.
    p_uni(t) = c(t)/T over the top-``vocab_size`` tokens, count-1 OOV
    floor (identical to unigram_logprob_score). λ·0 + (1−λ)·p_uni > 0
    always, so the log is defined.

    Scale: both model estimates aggregate token/pair streams with
    map-side combine; the retained models are bounded by the V and B
    PARAMETERS and broadcast; the per-document aggregation is the only
    data-scaled shuffle. The pair stream is rebuilt for the scoring
    pass (two scans end-to-end, like unigram_logprob_score's counts +
    probe split)."""
    # λ = 1 would zero out the unigram floor: an out-of-model pair gives
    # p = 0, where Spark's log2 returns NULL (avg silently skips) but
    # SQL engines yield -inf — two different wrong answers. Reject it.
    if not 0.0 <= lam < 1.0:
        raise ValueError(f"lam must be in [0, 1), got {lam}")
    if vocab_size <= 0 or bigram_size <= 0:
        raise ValueError("vocab_size and bigram_size must be positive")
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__t"))
    t = F.col("__t")
    n = F.size(t)
    pair_structs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.concat(
                    F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
                ).alias("pair"),
                F.element_at(t, i + 1).alias("tok"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pair:string,tok:string>>"))
    pairs = base.select(
        F.col(id_col), F.explode(pair_structs).alias("__p")
    ).select(F.col(id_col), F.col("__p.pair").alias("pair"),
             F.col("__p.tok").alias("tok"))

    # bigram model: conditional p(pair) = c(pair) / c(prev as pair START)
    pc = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("__cbi"))
    prevc = (
        pairs.select(F.substring_index("pair", " ", 1).alias("__prev"))
        .groupBy("__prev")
        .agg(F.count(F.lit(1)).alias("__cprev"))
    )
    pmodel = F.broadcast(
        pc.join(
            prevc,
            F.substring_index(F.col("pair"), " ", 1) == F.col("__prev"),
        )
        .select(
            "pair",
            (F.col("__cbi").cast("double") / F.col("__cprev").cast("double")
             ).alias("__pbi"),
            "__cbi",
        )
        .orderBy(F.col("__cbi").desc(), F.col("pair").asc())
        .limit(int(bigram_size))
        .drop("__cbi")
    )

    # unigram model: identical recipe to unigram_logprob_score
    uni = base.select(F.explode(t).alias("tok"))
    ucounts = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("__c"))
    total = ucounts.agg(F.sum("__c").cast("double").alias("__T"))
    vocab = F.broadcast(
        ucounts.orderBy(F.col("__c").desc(), F.col("tok").asc()).limit(
            int(vocab_size)
        )
    )

    p_uni = F.coalesce(F.col("__c"), F.lit(1)).cast("double") / F.col("__T")
    p = lam * F.coalesce(F.col("__pbi"), F.lit(0.0)) + (1.0 - lam) * p_uni
    return (
        pairs.join(pmodel, on="pair", how="left")
        .join(vocab, on="tok", how="left")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg(-F.log2(p)), 6).alias("nll_per_pair"),
        )
    )

def ngrams(t: Column, n: int) -> Column:
    """Word n-grams of a token array as space-joined strings (empty array
    when the document has fewer than ``n`` tokens). Pure array transform —
    no explode, stays inside the row."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n == 1:
        # normalize NULL arrays too — every path of this function (and
        # its oracles) returns an empty array, never NULL
        return F.coalesce(t, F.array().cast("array<string>"))
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _dup_char_fold(sorted_grams: Column) -> Column:
    """(dup_chars, total_chars) over a SORTED gram array, as one fold:
    total = Σ length(g) over every occurrence; dup = the same sum
    restricted to grams whose run length (= occurrence count, since the
    array is sorted) is ≥ 2. Runs are flushed when the element changes
    and once more at the end. Tokens are non-empty, so the '' sentinel
    for ``prev`` can never collide with a real gram."""
    zero = F.lit(0).cast("long")
    stepped = F.aggregate(
        sorted_grams,
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"),
            zero.alias("total"), zero.alias("dup"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                F.lit(1).cast("long")
            ).alias("run"),
            (acc["total"] + F.length(x)).alias("total"),
            (
                acc["dup"]
                + F.when(
                    (x != acc["prev"]) & (acc["run"] >= 2),
                    acc["run"] * F.length(acc["prev"]),
                ).otherwise(zero)
            ).alias("dup"),
        ),
        lambda acc: F.struct(
            (
                acc["dup"]
                + F.when(
                    acc["run"] >= 2, acc["run"] * F.length(acc["prev"])
                ).otherwise(zero)
            ).alias("dup"),
            acc["total"].alias("total"),
        ),
    )
    return stepped


def _dup_ngram_counts_arrow(base: DataFrame, ns: tuple[int, ...],
                            id_col: str) -> DataFrame:
    """Exact integer n-gram accounting as one vectorized NumPy pass per
    Arrow batch (guide §4.2): ``base`` is (id, __t token-array); output
    is (id, and per n: n_{n}grams, __dup_{n}, __tot_{n}) — the SAME
    integers the _dup_char_fold expression accumulates, so the caller's
    unchanged F.round(dup/total, 6) projection emits bit-identical
    fractions. Tokenization stays in the JVM (tokens() — Java \\s+ and
    toLowerCase semantics differ from Python's in corners), and token
    char lengths are Python len() = code points = Spark length().

    Per batch: factorize the flattened token stream (one hash pass over
    the batch, char lengths computed once per DISTINCT token), window
    the code stream into (doc, gram-token-ids) rows, then one
    np.unique(axis=0) per n gives exact per-(doc, gram) occurrence
    counts — dup = Σ gram-length over occurrences whose count ≥ 2,
    total = Σ gram-length over all occurrences, both exact int64."""
    import pandas as pd
    from pyspark.sql import types as T

    id_field = base.schema[id_col]
    fields = [id_field]
    for n in ns:
        fields += [
            T.StructField(f"n_{n}grams", T.LongType(), False),
            T.StructField(f"__dup_{n}", T.LongType(), False),
            T.StructField(f"__tot_{n}", T.LongType(), False),
        ]
    schema = T.StructType(fields)
    ns = tuple(int(n) for n in ns)

    def stats(batches):
        import numpy as np

        for pdf in batches:
            vals = pdf["__t"].to_numpy()
            ndoc = len(vals)
            L = np.fromiter((len(v) for v in vals), dtype=np.int64,
                            count=ndoc)
            out = {id_col: pdf[id_col]}
            if L.sum() == 0:
                for n in ns:
                    z = np.zeros(ndoc, dtype=np.int64)
                    out[f"n_{n}grams"] = z
                    out[f"__dup_{n}"] = z
                    out[f"__tot_{n}"] = z
                yield pd.DataFrame(out)
                continue
            flat = np.concatenate([np.asarray(v, dtype=object)
                                   for v in vals])
            codes, uniq = pd.factorize(flat)
            ulen = np.fromiter((len(u) for u in uniq), dtype=np.int64,
                               count=len(uniq))
            # prefix sums of per-token char lengths over the flat stream
            cp = np.concatenate(([0], np.cumsum(ulen[codes])))
            doc_end = np.cumsum(L)          # exclusive end per doc
            doc_start = doc_end - L
            for n in ns:
                m_per_doc = np.maximum(L - (n - 1), 0)
                # global start positions of every gram: for doc d, the
                # range [doc_start[d], doc_start[d] + m_d)
                total_m = int(m_per_doc.sum())
                if total_m == 0:
                    z = np.zeros(ndoc, dtype=np.int64)
                    out[f"n_{n}grams"] = m_per_doc
                    out[f"__dup_{n}"] = z
                    out[f"__tot_{n}"] = z
                    continue
                doc_of = np.repeat(np.arange(ndoc), m_per_doc)
                starts = (np.arange(total_m)
                          - np.repeat(np.cumsum(m_per_doc) - m_per_doc,
                                      m_per_doc)
                          + doc_start[doc_of])
                glen = cp[starts + n] - cp[starts] + (n - 1)
                rows = np.empty((total_m, n + 1), dtype=np.int64)
                rows[:, 0] = doc_of
                for j in range(n):
                    rows[:, j + 1] = codes[starts + j]
                _, inv, cnt = np.unique(
                    rows, axis=0, return_inverse=True, return_counts=True)
                dup_mask = cnt[inv] >= 2
                tot = np.bincount(doc_of, weights=glen,
                                  minlength=ndoc).astype(np.int64)
                dup = np.bincount(doc_of[dup_mask],
                                  weights=glen[dup_mask],
                                  minlength=ndoc).astype(np.int64)
                out[f"n_{n}grams"] = m_per_doc
                out[f"__dup_{n}"] = dup
                out[f"__tot_{n}"] = tot
            yield pd.DataFrame(out)

    return base.mapInPandas(stats, schema)


def dup_ngram_stats(
    df: DataFrame,
    ns: tuple[int, ...] = (2, 3),
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "arrow",
) -> DataFrame:
    """Gopher's duplicated-n-gram repetition signal (Rae et al. 2021,
    §A1.1), per document and per n in ``ns``: the fraction of n-gram
    CHARACTERS that belong to n-grams occurring more than once in the
    document. Complements repetition_signals (which reports only the
    single most frequent token/bigram): a document stitched from many
    different repeated phrases has a low top-n-gram share but a high
    duplicated-n-gram fraction.

    Character accounting rule (the operator contract, mirrored by the
    oracle): each n-gram occurrence contributes length(gram) characters
    — the space-joined string length — to the denominator, and to the
    numerator iff that gram occurs ≥ 2 times in the document. Both sums
    are exact integers, so the ratio is engine-identical; fractions are
    rounded to 6 decimals; documents with fewer than n tokens report 0.

    100 TB shape: map-only — duplicate counting is a single pass over
    the per-document gram multiset, so there is no explode, no groupBy,
    and no shuffle; the cost is the corpus scan.

    ``impl``: "arrow" (default) counts via one vectorized NumPy pass per
    Arrow batch (_dup_ngram_counts_arrow) — Catalyst's interpreted
    lambda fold does no subexpression elimination and blocks codegen
    (the r14 §9 pipeline-filter mechanism; measured 2.9 s → sub-second
    noop at sf0.1). "expr" keeps the pure-JVM fold (the reference
    implementation the equivalence test pins). Both produce identical
    integers; the fraction is the same F.round projection either way."""
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__t"))
    if impl == "arrow":
        # spread() first (the shingles() pattern): the counting kernel's
        # per-doc cost dwarfs a row's shuffle cost, and a narrow scan
        # (few row groups — the sf1 fixture reads as 2 partitions)
        # otherwise serializes the whole corpus onto a couple of tasks.
        # Wide inputs (the 100 TB case) pass through exchange-free.
        base = spread(df, by=id_col).select(
            F.col(id_col), toks.alias("__t"))
        counts = _dup_ngram_counts_arrow(base, ns, id_col)
        cols = [F.col(id_col)]
        for n in ns:
            cols.append(F.col(f"n_{n}grams"))
            cols.append(
                F.when(
                    F.col(f"__tot_{n}") > 0,
                    F.round(
                        F.col(f"__dup_{n}").cast("double")
                        / F.col(f"__tot_{n}"), 6),
                )
                .otherwise(F.lit(0.0))
                .alias(f"dup_{n}gram_char_frac")
            )
        return counts.select(*cols)
    if impl != "expr":
        raise ValueError(f"impl must be 'arrow' or 'expr', got {impl!r}")
    cols = [F.col(id_col)]
    for n in ns:
        grams = ngrams(F.col("__t"), n)
        st = _dup_char_fold(F.array_sort(grams))
        cols.append(F.size(grams).cast("long").alias(f"n_{n}grams"))
        cols.append(
            F.when(
                st["total"] > 0,
                F.round(st["dup"].cast("double") / st["total"], 6),
            )
            .otherwise(F.lit(0.0))
            .alias(f"dup_{n}gram_char_frac")
        )
    return base.select(*cols)


# Gopher rule thresholds (Rae et al. 2021, §A1.1) — the defaults are the
# published ones; every threshold is a keyword parameter.
GOPHER_RULES = (
    "too_few_words", "too_many_words", "mean_word_len",
    "symbol_ratio", "alpha_frac", "stopwords",
)


def gopher_quality_filter(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher rule-based quality filter (Rae et al. 2021, §A1.1): the
    named pass/fail heuristics a pretraining cleanup applies after
    dedup, with an explicit reason trail per document:

     - word count within [min_words, max_words]
     - mean word length within [min_mean_word_len, max_mean_word_len]
     - symbol-to-word ratio (# and … occurrences / words) ≤ max
     - fraction of words containing an ASCII letter ≥ min_alpha_word_frac
     - at least min_stop_hits DISTINCT English stopwords present

    (The paper's line-shaped rules — bullet/ellipsis line fractions —
    need newline structure the document model here doesn't carry; they
    belong to a display-text variant.)

    Returns (id, n_words, mean_word_len, symbol_word_ratio,
    alpha_word_frac, stop_hits, fail_reasons, passes) where
    fail_reasons is a comma-joined, fixed-order subset of GOPHER_RULES
    and passes = (fail_reasons = ''). Ratios round to 6 decimals and
    the THRESHOLD comparisons use the rounded values, so pass/fail is
    engine-exact. Map-only: one projection over the scan, no shuffle."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    mean_len = F.round(
        safe(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
            .cast("double"),
            n,
        ),
        6,
    )
    n_symbols = F.size(F.regexp_extract_all(text, F.lit("[#…]"), 0))
    symbol_ratio = F.round(safe(n_symbols.cast("double"), n), 6)
    alpha_frac = F.round(
        safe(
            F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double"), n
        ),
        6,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]]),
        )
    )
    fails = [
        F.when(n < min_words, F.lit("too_few_words")),
        F.when(n > max_words, F.lit("too_many_words")),
        F.when(
            (mean_len < min_mean_word_len) | (mean_len > max_mean_word_len),
            F.lit("mean_word_len"),
        ),
        F.when(symbol_ratio > max_symbol_word_ratio, F.lit("symbol_ratio")),
        F.when(alpha_frac < min_alpha_word_frac, F.lit("alpha_frac")),
        F.when(stop_hits < min_stop_hits, F.lit("stopwords")),
    ]
    reasons = F.concat_ws(",", *fails)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        reasons.alias("fail_reasons"),
        (reasons == "").alias("passes"),
    )


def perplexity_buckets(
    df: DataFrame,
    vocab_size: int | None = 100,
    qs: tuple[float, ...] = (1.0 / 3, 2.0 / 3),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    approx: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank the
    corpus by the unigram-NLL quality proxy (unigram_logprob_score) and
    split it at the ``qs`` quantiles into len(qs)+1 labelled buckets —
    head = most corpus-typical, tail = most atypical — the standard
    input for quality-aware mixture weighting (sample more head, less
    tail). Returns one row per bucket: (bucket, n_docs, min_nll,
    max_nll, total_tokens).

    Bucket rule (the operator contract): doc → labels[i] for the first
    quantile threshold with nll ≤ q_i, else the last label. Thresholds
    are EXACT interpolated percentiles over the rounded-to-6 NLLs —
    Spark's percentile() and DuckDB's quantile_cont() produce
    bit-identical doubles on identical inputs (verified at both test
    scale factors), so the cut is engine-exact. min/max are over
    rounded values; n_docs/total_tokens are integers.

    Scale: everything is unigram_logprob_score's shape plus ONE
    eager single-row threshold job whose result folds into a map-only
    CASE as literals. Exact percentile() buffers the per-doc NLL column
    on the final reducer — one double per document, fine into the
    billions of docs; past that set ``approx=True``
    (percentile_approx, bounded sketch memory, no SQL oracle)."""
    labeled = perplexity_bucket_labels(
        df, vocab_size=vocab_size, qs=qs, labels=labels, approx=approx,
        text_col=text_col, id_col=id_col,
    )
    return (
        labeled.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("nll_per_token").alias("min_nll"),
            F.max("nll_per_token").alias("max_nll"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


def perplexity_bucket_labels(
    df: DataFrame,
    vocab_size: int | None = 100,
    qs: tuple[float, ...] = (1.0 / 3, 2.0 / 3),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    approx: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document form of perplexity_buckets: (id, n_tokens,
    nll_per_token, bucket) — the composable labelling pass that
    quality-aware downstream steps (mixture sampling, per-bucket caps)
    join against. Same bucket rule, thresholds, and scale shape as
    perplexity_buckets (which is this plus a bucket-keyed rollup).

    The quantile thresholds are computed EAGERLY (one Spark job at
    call time; same build-the-model-on-the-driver precedent as
    ivf_topk's centroids) and folded into the label projection as
    literals.

    r14 (guide §5): the NLL table is pinned through dedup's bounded
    _pin_cache before the threshold job, so the downstream action reads
    the cached (doc-scaled: id + two numerics) table instead of
    re-running the whole unigram-NLL subtree — which itself costs two
    corpus tokenize passes — a second time. The earlier leak concern
    (an internal .persist() with no unpersist handle) is what the
    per-session FIFO + release_caches() exists to solve; eviction only
    ever costs recompute."""
    if len(labels) != len(qs) + 1:
        raise ValueError(
            f"need len(qs)+1 labels, got {len(labels)} labels for {len(qs)} quantiles"
        )
    from coolplaydruid_spark.operators.dedup import _pin_cache

    nll = _pin_cache(unigram_logprob_score(
        df, vocab_size=vocab_size, text_col=text_col, id_col=id_col
    ))
    v = F.col("nll_per_token")
    pct = (
        F.percentile_approx(v, F.lit(list(qs)), F.lit(10_000))
        if approx
        else F.percentile(v, F.lit(list(qs)))
    )
    th = nll.agg(pct.alias("__p")).collect()[0]["__p"]
    bucket = F.lit(labels[-1])
    if th is not None and all(t is not None for t in th):
        for i in range(len(qs) - 1, -1, -1):
            bucket = F.when(v <= F.lit(float(th[i])), F.lit(labels[i])).otherwise(bucket)
    # else: empty corpus — no rows to label, the CASE never evaluates
    return nll.select(
        F.col(id_col), F.col("n_tokens"), v, bucket.alias("bucket")
    )

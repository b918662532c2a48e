"""Text-analysis operators for training-data pipelines.

All hot-path computation is built-in column expressions (JVM, codegen):
tokenization via split/regexp, quality ratios as integer/floor math,
language ID as stopword-hit argmax, fingerprints via md5 and a
winnowing-style rolling hash.  Designed so a DuckDB oracle can state the
same computation exactly (no floats except through deterministic FLOOR).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from commons_codec_spark.colutil import let

#: BPE-ish token pattern: letter runs, digit runs, single punctuation.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

#: Tiny stopword inventories for the lang-id heuristic (top function words).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "que"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "un", "una", "por"],
}


def normalize(text: Column) -> Column:
    """lower + collapse whitespace — the canonical form for fingerprints."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    return F.split(normalize(text), " ")


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count via the BPE-style regex."""
    return F.regexp_count(text, F.lit(TOKEN_PATTERN))


def alpha_ratio_pct(text: Column) -> Column:
    """floor(100 * alphabetic chars / chars)."""
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    return F.floor(alpha * 100.0 / F.greatest(F.length(text), F.lit(1))).cast("long")


def punct_ratio_pct(text: Column) -> Column:
    punct = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", ""))
    return F.floor(punct * 100.0 / F.greatest(F.length(text), F.lit(1))).cast("long")


def stopword_hits(text: Column, lang: str = "en") -> Column:
    words = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(words, t)))


def stopword_ratio_pct(text: Column, lang: str = "en") -> Column:
    return F.floor(
        stopword_hits(text, lang) * 100.0 / F.greatest(ws_token_count(text), F.lit(1))
    ).cast("long")


def quality_score(text: Column) -> Column:
    """Composite 0-100 quality heuristic: long enough, alphabetic, has
    stopwords, not punctuation-heavy.  Integer math throughout."""
    length_component = F.least(F.length(text), F.lit(500)) * 100 / 500
    return F.floor(
        0.3 * length_component
        + 0.3 * alpha_ratio_pct(text)
        + 0.3 * F.least(stopword_ratio_pct(text) * 4, F.lit(100))
        + 0.1 * (100 - F.least(punct_ratio_pct(text) * 5, F.lit(100)))
    ).cast("long")


def lang_id(text: Column) -> Column:
    """Stopword-hit argmax over LANG_STOPWORDS; 'und' (undetermined) when
    no language scores a hit.  Ties resolve in dict order (en first).

    Form: each language's score is computed ONCE into a let-bound array
    and the winner is ``array_position(arr, array_max(arr))`` — first
    index achieving the max, which IS the CASE-chain tie rule (strictly
    greater than every earlier language, >= every later one).  The
    earlier explicit CASE chain instantiated every score subtree up to
    7× (pairwise comparisons) and the tokenization under each — HOF
    lambdas get no subexpression elimination — measured ~20 % slower on
    the full corpus with bit-identical output (the DuckDB oracle keeps
    the CASE form; equality over every document verified before the
    swap)."""
    toks = tokens(text)

    def scores_of(tk: Column) -> Column:
        return F.array(*[
            F.size(F.filter(
                tk, lambda t: F.array_contains(F.array(*[F.lit(w) for w in ws]), t)
            ))
            for ws in LANG_STOPWORDS.values()
        ])

    langs_lit = F.array(*[F.lit(lang) for lang in LANG_STOPWORDS])

    def pick(arr: Column) -> Column:
        mx = F.array_max(arr)
        return F.when(
            mx > 0,
            F.element_at(langs_lit, F.array_position(arr, mx).cast("int")),
        ).otherwise(F.lit("und"))

    return let(let(toks, scores_of), pick)


def top_ngrams(
    df, text_col: str = "text", n: int = 3, k: int = 20, id_col: str | None = None
):
    """Corpus-level frequent word n-grams: (ngram, doc_freq, total_freq).

    ``doc_freq`` counts documents containing the gram at least once,
    ``total_freq`` counts occurrences.  One explode + one hash aggregation
    (map-side combine), then a global top-k — the boilerplate-detection
    primitive a training pipeline runs before dedup (frequent grams ≈
    headers/footers/license blurbs).  Ties rank by gram text for
    determinism.  At 100 TB: the explode multiplies rows ~|tokens| per
    doc, but partial aggregation collapses them within each task before
    the single shuffle on the gram.
    """
    import pyspark.sql.functions as FF
    from pyspark.sql import Window as W

    def build(toks: Column) -> Column:
        count = F.size(toks) - (n - 1)
        return F.when(count >= 1, F.transform(
            F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )).otherwise(F.array().cast("array<string>"))

    grams = df.select(
        F.explode(let(tokens(F.col(text_col)), build)).alias("ngram"),
        *([F.col(id_col)] if id_col else []),
    )
    agg = grams.groupBy("ngram").agg(
        FF.count(FF.lit(1)).alias("total_freq"),
        *(
            [FF.countDistinct(id_col).alias("doc_freq")]
            if id_col
            else [FF.count(FF.lit(1)).alias("doc_freq")]
        ),
    )
    # orderBy+limit plans as TakeOrdered (per-partition top-k, tiny merge on
    # the driver) — a global row_number window would single-partition the
    # full distinct-gram set
    top = agg.orderBy(FF.desc("total_freq"), FF.asc("ngram")).limit(int(k))
    w = W.orderBy(FF.desc("total_freq"), FF.asc("ngram"))
    return top.withColumn("rank", FF.row_number().over(w)).select(
        "rank", "ngram", "doc_freq", "total_freq"
    )


def md5_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text."""
    return F.md5(normalize(text))


def rolling_fingerprints(text: Column, k: int = 5, window: int = 4) -> Column:
    """Winnowing-style document fingerprint set (Schleimer et al., SIGMOD'03).

    Hash every k-gram of the normalized character stream (md5-based for
    engine-portability), then keep the minimum hash of every `window`
    consecutive k-grams; distinct-sorted result identifies near-identical
    passages.  Pure higher-order column functions — no UDF.
    """
    # Both the normalized string and the gram-hash array are let-bound:
    # HOF lambdas have no common-subexpression elimination, so a naive
    # transform(sequence(1, n_windows), i -> array_min(slice(hashes, i, w)))
    # would recompute the full gram+md5 array once per window (quadratic),
    # and norm.substr inside the gram lambda would re-run the normalize
    # regex per gram.  The rolling min is `window` shifted slices of the
    # bound hash array zipped with least().
    def over_hashes(hashes: Column) -> Column:
        n_windows = F.size(hashes) - window + 1
        mins = F.slice(hashes, 1, F.greatest(n_windows, F.lit(1)))
        for off in range(1, window):
            shifted = F.slice(hashes, off + 1, F.greatest(n_windows, F.lit(1)))
            mins = F.zip_with(mins, shifted, lambda a, b: F.least(a, b))
        out = F.array_sort(F.array_distinct(mins))
        return F.when(n_windows < 1, F.array().cast("array<string>")).otherwise(out)

    def over_norm(norm: Column) -> Column:
        n_grams = F.length(norm) - k + 1
        grams = F.when(n_grams < 1, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
                lambda i: norm.substr(i, F.lit(k)),
            )
        )
        return let(F.transform(grams, lambda g: F.md5(g)), over_hashes)

    return let(normalize(text), over_norm)


# ---------------------------------------------------------------------------
# PII-style redaction (corpus scrubbing)
# ---------------------------------------------------------------------------

#: Redaction patterns, applied IN THIS ORDER (URL first so an email-like
#: userinfo inside a URL is already gone when the email pass runs).  Kept
#: to the regex subset Java (Spark) and RE2 (DuckDB) treat identically.
REDACT_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact(text: Column) -> Column:
    """Scrub URLs, e-mail addresses and IPv4 literals to placeholder
    tokens — the standard pre-training privacy pass.  Pure
    ``regexp_replace`` chain (JVM, codegen); at 100 TB this is a map-only
    stage with no shuffle."""
    out = text
    for _name, pattern, token in REDACT_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def redaction_counts(text: Column) -> list[Column]:
    """One ``<name>_hits`` count column per redaction pattern, evaluated
    on the SAME pre-redaction text (order-independent counting; the
    redact() chain itself stays sequential)."""
    return [
        F.regexp_count(text, F.lit(pattern)).cast("long").alias(f"{name}_hits")
        for name, pattern, _token in REDACT_PATTERNS
    ]


# ---------------------------------------------------------------------------
# Model-based quality scoring (CCNet-style unigram log-probability)
# ---------------------------------------------------------------------------


def unigram_logprob(docs, text_col: str = "text", id_col: str = "doc_id",
                    precision: int = 3):
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the model-based quality signal perplexity filters
    threshold on (CCNet-style: low-probability token soup scores far
    below fluent prose), complementing the heuristic ratios in
    :func:`repetition_ratios` / ``quality_score``.

    Two aggregations + one join, all standard shapes at 100 TB:

    * corpus term frequencies — one hash shuffle on ``tok``, map-side
      combined, output is the VOCABULARY (≪ corpus);
    * per-doc mean of ``ln(count(tok)/total)`` over the token multiset —
      the token→frequency join is PINNED to a broadcast hash join: the
      join key is Zipf-skewed ("the" is a hot key), so a sort-merge
      fallback would shuffle the full token stream onto a skewed key at
      100 TB.  A natural-language vocabulary is ~10^6-10^7 terms (tens of
      MB) at ANY corpus size, so broadcasting is safe; for a pathological
      vocabulary that outgrows the driver (e.g. tokenizing random bytes),
      cap the model to the top-N terms by frequency before the join, or
      salt ``tok`` — both preserve the skew-free plan.  Then one
      doc-keyed aggregation.

    The mean is rounded to ``precision`` decimals IN the result (both the
    engine and any SQL oracle state the same rounding) so last-ulp libm
    and summation-order differences cannot surface.
    """
    toks = docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = tf.agg(F.sum("c").alias("s"))
    return (
        toks.join(F.broadcast(tf), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.round(F.avg(F.log(F.col("c") / F.col("s"))), precision).alias(
                "avg_logprob"
            ),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Repetition ratios (Gopher-style quality filter signals)
# ---------------------------------------------------------------------------


def repetition_ratios(text: Column) -> list[Column]:
    """Duplicate-token and duplicate-character percentages — the
    repetition signals corpus quality filters threshold on (boilerplate
    and degenerate generations repeat themselves).  Over whitespace
    tokens of the normalized text; integer FLOOR percentages so any
    engine states the identical arithmetic.

    * ``dup_token_pct``  = floor((n_tokens − n_distinct) · 100 / n_tokens)
    * ``dup_char_pct``   = floor((chars_all − chars_distinct) · 100 / chars_all)
      where chars are summed over the token multiset vs the distinct set
      (set-sum, so engine-specific distinct ORDER cannot matter).

    Pure array expressions — map-only, no shuffle, no UDF.
    """
    toks = tokens(text)

    def pct(num: Column, den: Column) -> Column:
        return F.floor(num * 100 / F.greatest(den, F.lit(1))).cast("long")

    return [
        let(
            toks,
            lambda t: pct(
                F.size(t) - F.size(F.array_distinct(t)), F.size(t)
            ),
        ).alias("dup_token_pct"),
        let(
            toks,
            lambda t: pct(
                F.length(F.concat_ws("", t))
                - F.length(F.concat_ws("", F.array_distinct(t))),
                F.length(F.concat_ws("", t)),
            ),
        ).alias("dup_char_pct"),
    ]


# ---------------------------------------------------------------------------
# Document chunking (context-window preparation)
# ---------------------------------------------------------------------------


def chunk_by_tokens(
    df,
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
):
    """Split each document into overlapping fixed-token-count chunks —
    the standard context-window preparation step before tokenization.

    One row per chunk: all input columns + ``chunk_idx`` (0-based) +
    ``chunk_text`` (the whitespace tokens ``[start, start+chunk_tokens)``
    re-joined) + ``chunk_n_tokens``.  Start offsets advance by
    ``chunk_tokens - overlap``; the final chunk may be shorter.  Pure
    array expressions (``sequence`` + ``slice`` under a ``let``) and one
    ``explode`` — the row multiplication happens JVM-side with no UDF,
    and the (large) text column is never duplicated upstream of the
    explode.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))

    chunk_structs = let(
        toks,
        lambda t: F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(F.size(t) - 1, F.lit(0)),
                F.lit(stride),
            ),
            lambda s: F.struct(
                (s / stride).cast("long").alias("chunk_idx"),
                F.concat_ws(" ", F.slice(t, s + 1, chunk_tokens)).alias(
                    "chunk_text"
                ),
                F.least(F.size(t) - s, F.lit(chunk_tokens))
                .cast("long")
                .alias("chunk_n_tokens"),
            ),
        ),
    )
    out = df.select("*", F.explode(chunk_structs).alias("__c"))
    return out.select(
        *df.columns, "__c.chunk_idx", "__c.chunk_text", "__c.chunk_n_tokens"
    )

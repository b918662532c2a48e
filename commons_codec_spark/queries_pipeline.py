"""Training-data-pipeline queries over documents/embeddings, oracle-paired.

Near-dup queries inject deterministic perturbed copies *in the query* (the
synthetic corpus has no natural duplicates), so both engines derive the
same augmented corpus and the dedup operators have real work to do.

Everything hashes exactly: md5-based signatures, integer quantization for
cosine, FLOOR for ratios — see operators/{dedup,similarity,text}.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from commons_codec_spark.operators import dedup, similarity, text
from commons_codec_spark.readers import ensure_parallel, read_table


def _docs(spark: SparkSession, sf_dir: str, fan_out: bool = True) -> DataFrame:
    # scan fan-out for the single-row-group testdata files — see readers.py;
    # fan_out=False for aggregation-first queries (partial agg collapses
    # map-side; the fan-out shuffle measured as pure cost there)
    return read_table(spark, sf_dir, "documents", fan_out=fan_out)


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


def _augmented_docs(
    spark: SparkSession, sf_dir: str, fan_out: bool = True
) -> DataFrame:
    """documents + exact copies (id%50==0, +1M) + near copies (id%25==0, +2M,
    one appended token).  Fan-out happens ONCE on the union (one shuffle),
    not per branch — see readers.py."""
    d = _docs(spark, sf_dir, fan_out=False).select("doc_id", "text")
    exact = d.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), F.col("text")
    )
    near = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzznearmarker")).alias("text"),
    )
    aug = d.unionAll(exact).unionAll(near)
    if fan_out:
        aug = ensure_parallel(spark, aug, key=f"aug-docs:{sf_dir}")
    return aug


_SQL_AUGMENTED = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id, text || ' zzznearmarker' AS text
    FROM documents WHERE doc_id % 25 = 0
"""

_SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # window-over-fingerprint is the first shuffle; fan-out measured as
    # pure cost for this cheap per-row hash
    aug = _augmented_docs(spark, sf_dir, fan_out=False)
    return dedup.exact_dedup_flags(aug, "doc_id", "text").select(
        "doc_id", "content_md5", "is_dup"
    )


SQL_DEDUP_EXACT = f"""
SELECT doc_id,
       md5({_SQL_NORM}) AS content_md5,
       doc_id <> MIN(doc_id) OVER (PARTITION BY md5({_SQL_NORM})) AS is_dup
FROM ({_SQL_AUGMENTED})
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _augmented_docs(spark, sf_dir)
    return dedup.lsh_candidate_pairs(
        aug, "doc_id", "text", num_hashes=8, band_size=2, verify_threshold_pct=50
    )


def _sql_shingles(norm: str) -> str:
    toks = f"string_split({norm}, ' ')"
    return (
        f"list_sort(list_distinct(list_transform(range(1, greatest(len({toks}) - 1, 1)), "
        f"i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])))"
    )


def _sql_minhash(k: int) -> str:
    return (
        f"list_aggregate(list_transform(sh, s -> md5('{k}|' || s)), 'min')"
    )


SQL_DEDUP_MINHASH = f"""
WITH docs AS (
    SELECT doc_id, {_sql_shingles(_SQL_NORM)} AS sh
    FROM ({_SQL_AUGMENTED})
    WHERE len(string_split({_SQL_NORM}, ' ')) >= 3
),
sigs AS (
    SELECT doc_id, sh,
           {", ".join(f"{_sql_minhash(k)} AS mh{k}" for k in range(8))}
    FROM docs
),
banded AS (
    SELECT doc_id, sh, unnest([
        md5('0|' || mh0 || '|' || mh1),
        md5('1|' || mh2 || '|' || mh3),
        md5('2|' || mh4 || '|' || mh5),
        md5('3|' || mh6 || '|' || mh7)
    ]) AS band
    FROM sigs
),
cand AS (
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.sh AS sa, r.sh AS sb
    FROM banded l JOIN banded r ON l.band = r.band AND l.doc_id < r.doc_id
)
SELECT a, b,
       CAST(FLOOR(len(list_intersect(sa, sb)) * 100.0 /
            greatest(len(list_distinct(sa || sb)), 1)) AS BIGINT) AS jaccard_pct
FROM cand
WHERE FLOOR(len(list_intersect(sa, sb)) * 100.0 /
      greatest(len(list_distinct(sa || sb)), 1)) >= 50
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard for the deterministic (orig, near-copy)
    candidate pairing — the verification kernel in isolation."""
    aug = _augmented_docs(spark, sf_dir)
    sh = aug.select(
        "doc_id", dedup.word_shingles(F.col("text")).alias("sh")
    )
    orig = sh.filter(F.col("doc_id") % 25 == 0).filter(F.col("doc_id") < 1_000_000)
    near = sh.filter(F.col("doc_id") >= 2_000_000).select(
        (F.col("doc_id") - 2_000_000).alias("doc_id"), F.col("sh").alias("sh_b")
    )
    return (
        orig.join(near, on="doc_id")
        .select(
            F.col("doc_id").alias("a"),
            (F.col("doc_id") + 2_000_000).alias("b"),
            dedup.jaccard_pct(F.col("sh"), F.col("sh_b")).alias("jaccard_pct"),
        )
    )


SQL_DEDUP_NGRAM = f"""
WITH aug AS ({_SQL_AUGMENTED}),
sh AS (SELECT doc_id, {_sql_shingles(_SQL_NORM)} AS sh FROM aug)
SELECT o.doc_id AS a, n.doc_id AS b,
       CAST(FLOOR(len(list_intersect(o.sh, n.sh)) * 100.0 /
            greatest(len(list_distinct(o.sh || n.sh)), 1)) AS BIGINT) AS jaccard_pct
FROM sh o JOIN sh n ON n.doc_id = o.doc_id + 2000000
WHERE o.doc_id % 25 = 0 AND o.doc_id < 1000000
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over the verified LSH pairs
    (the canonical-keeper assignment a dedup pipeline actually applies)."""
    aug = _augmented_docs(spark, sf_dir)
    pairs = dedup.lsh_candidate_pairs(
        aug, "doc_id", "text", num_hashes=8, band_size=2, verify_threshold_pct=50
    )
    return dedup.dedup_clusters(pairs.select("a", "b")).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering through the O(log n)-round large-star/small-star
    algorithm (the scale path for long near-dup chains) — identical
    oracle as the min-label variant."""
    aug = _augmented_docs(spark, sf_dir)
    pairs = dedup.lsh_candidate_pairs(
        aug, "doc_id", "text", num_hashes=8, band_size=2, verify_threshold_pct=50
    )
    return dedup.dedup_clusters_star(pairs.select("a", "b")).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE
pairs AS (SELECT a, b FROM ({SQL_DEDUP_MINHASH}) t),
edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
reach(id, lbl) AS (
    SELECT DISTINCT a AS id, a AS lbl FROM edges
    UNION
    SELECT e.a AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.b
)
SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 16-bit simhash (the oracle-checkable core of simhash dedup)."""
    aug = _augmented_docs(spark, sf_dir)
    return aug.select("doc_id", dedup.simhash16(F.col("text")).alias("simhash"))


def _sql_simhash() -> str:
    toks = f"list_distinct(string_split({_SQL_NORM}, ' '))"
    bits = []
    for b in range(16):
        ones = (
            f"len(list_filter({toks}, t -> substr(md5(t), {b + 1}, 1) IN "
            f"('8','9','a','b','c','d','e','f')))"
        )
        bits.append(f"CASE WHEN {ones} * 2 > len({toks}) THEN {1 << b} ELSE 0 END")
    return " + ".join(bits)


SQL_DEDUP_SIMHASH = f"""
SELECT doc_id, CAST({_sql_simhash()} AS BIGINT) AS simhash
FROM ({_SQL_AUGMENTED})
"""


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    embs = _embs(spark, sf_dir)
    probes = embs.filter(F.col("vec_id") % 100 == 0)
    return similarity.brute_force_topk(embs, probes, k=5)


SQL_COSINE_TOPK = """
WITH q AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
    FROM embeddings
),
n AS (
    SELECT vec_id, qv,
           list_aggregate(list_transform(qv, x -> x * x), 'sum') AS n2
    FROM q
),
pairs AS (
    SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
           list_aggregate(list_transform(range(1, 65), i -> p.qv[i] * c.qv[i]), 'sum') AS dot,
           p.n2 AS p2, c.n2 AS n2
    FROM n p JOIN n c ON p.vec_id % 100 = 0 AND p.vec_id <> c.vec_id
),
scored AS (
    SELECT probe_id, neighbor_id,
           CAST(CASE WHEN dot < 0 THEN -1 ELSE 1 END *
                FLOOR(CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) * 10000.0 /
                      greatest(CAST(p2 AS DOUBLE) * CAST(n2 AS DOUBLE), 1.0)) AS BIGINT) AS cos2_bp
    FROM pairs
)
SELECT probe_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos2_bp DESC, neighbor_id ASC) AS INT) AS rank,
       cos2_bp
FROM scored
QUALIFY rank <= 5
"""


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        text.ws_token_count(t).cast("long").alias("ws_tokens"),
        text.bpe_ish_token_count(t).cast("long").alias("bpe_tokens"),
        text.alpha_ratio_pct(t).alias("alpha_pct"),
        text.stopword_ratio_pct(t).alias("stopword_pct"),
        text.quality_score(t).alias("quality"),
        text.md5_fingerprint(t).alias("fingerprint"),
    )


def q_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII scrub: deterministic synthetic contacts (e-mail, URL,
    IPv4 for every third doc) are injected into each document, then the
    redaction chain replaces them with placeholder tokens.  Per-doc hit
    counts + an md5 over the scrubbed text make the whole transform
    oracle-checkable byte-for-byte."""
    d = _docs(spark, sf_dir)
    did = F.col("doc_id").cast("long")
    injected = F.concat(
        F.col("text"),
        F.format_string(" contact user%d@example.com", did),
        F.format_string(" via https://example.org/doc/%d?ref=x", did),
        F.when(
            did % 3 == 0,
            F.format_string(" from 10.0.%d.%d", did % 256, did % 100),
        ).otherwise(F.lit("")),
    )
    from commons_codec_spark.operators.text import redact, redaction_counts

    return d.select(
        "doc_id",
        *redaction_counts(injected),
        F.md5(redact(injected)).alias("redacted_md5"),
    )


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals: every fourth document gets its own
    text appended once (a fully-duplicated doc half — the degenerate
    case filters must flag), the rest measure natural token repetition."""
    d = _docs(spark, sf_dir)
    did = F.col("doc_id").cast("long")
    t = F.when(did % 4 == 0, F.concat_ws(" ", "text", "text")).otherwise(
        F.col("text")
    )
    from commons_codec_spark.operators.text import repetition_ratios

    return d.select("doc_id", *repetition_ratios(t))


SQL_TEXT_REPETITION = f"""
WITH t AS (
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0 THEN text || ' ' || text ELSE text END AS raw
    FROM documents
),
toks AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(lower(raw), '\\s+', ' ', 'g')), ' ') AS tk
    FROM t
)
SELECT doc_id,
       CAST(FLOOR((len(tk) - len(list_distinct(tk))) * 100
                  / greatest(len(tk), 1)) AS BIGINT) AS dup_token_pct,
       CAST(FLOOR((len(array_to_string(tk, '')) -
                   len(array_to_string(list_distinct(tk), ''))) * 100
                  / greatest(len(array_to_string(tk, '')), 1)) AS BIGINT)
           AS dup_char_pct
FROM toks
"""


def q_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: each doc split into 32-token chunks with
    8-token overlap (stride 24); one row per chunk with a content md5 so
    the boundaries are pinned byte-for-byte."""
    from commons_codec_spark.operators.text import chunk_by_tokens

    d = _docs(spark, sf_dir).select("doc_id", "text")
    out = chunk_by_tokens(d, "text", chunk_tokens=32, overlap=8)
    return out.select(
        "doc_id", "chunk_idx", "chunk_n_tokens",
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )


SQL_TEXT_CHUNKING = f"""
WITH toks AS (
    SELECT doc_id, string_split({_SQL_NORM}, ' ') AS tk FROM documents
),
starts AS (
    SELECT doc_id, tk,
           unnest(range(0, greatest(len(tk), 1), 24)) AS s
    FROM toks
)
SELECT doc_id,
       CAST(s / 24 AS BIGINT) AS chunk_idx,
       CAST(least(len(tk) - s, 32) AS BIGINT) AS chunk_n_tokens,
       md5(array_to_string(list_slice(tk, s + 1, s + 32), ' ')) AS chunk_md5
FROM starts
"""


def q_corpus_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-local next-fit sequence packing: docs sharded doc_id%8,
    packed into 4000-char bins largest-first; per-bin doc count and fill
    level must match the oracle's identical window arithmetic."""
    from commons_codec_spark.operators.packing import pack_next_fit

    d = _docs(spark, sf_dir, fan_out=False).select(
        "doc_id", F.col("n_chars").cast("long").alias("sz")
    )  # window-first over 2 narrow columns: nothing to fan out
    packed = pack_next_fit(
        d, "doc_id", "sz", budget=4000, shard_expr=F.pmod(F.col("doc_id"), F.lit(8))
    )
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("sz").cast("long").alias("fill"),
        F.max(F.col("oversize").cast("int")).cast("long").alias("has_oversize"),
    )


SQL_CORPUS_PACKING = """
WITH packed AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS sz,
           doc_id % 8 AS shard,
           CAST(FLOOR((SUM(CAST(n_chars AS BIGINT)) OVER (
                    PARTITION BY doc_id % 8
                    ORDER BY CAST(n_chars AS BIGINT) DESC, doc_id
                ) - CAST(n_chars AS BIGINT)) / 4000) AS BIGINT) AS bin_id
    FROM documents
)
SELECT shard, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(sz) AS BIGINT) AS fill,
       CAST(MAX(CASE WHEN sz > 4000 THEN 1 ELSE 0 END) AS BIGINT) AS has_oversize
FROM packed
GROUP BY shard, bin_id
"""


_SQL_RE_URL = r"https?://[^\s]+"
_SQL_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_SQL_RE_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

SQL_TEXT_REDACT = f"""
WITH t AS (
    SELECT doc_id,
           text || ' contact user' || doc_id || '@example.com'
                || ' via https://example.org/doc/' || doc_id || '?ref=x'
                || CASE WHEN doc_id % 3 = 0
                        THEN ' from 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
                        ELSE '' END AS txt
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(txt, '{_SQL_RE_URL}')) AS BIGINT) AS url_hits,
       CAST(len(regexp_extract_all(txt, '{_SQL_RE_EMAIL}')) AS BIGINT) AS email_hits,
       CAST(len(regexp_extract_all(txt, '{_SQL_RE_IP}')) AS BIGINT) AS ipv4_hits,
       md5(regexp_replace(regexp_replace(regexp_replace(
               txt, '{_SQL_RE_URL}', '<URL>', 'g'),
               '{_SQL_RE_EMAIL}', '<EMAIL>', 'g'),
               '{_SQL_RE_IP}', '<IP>', 'g')) AS redacted_md5
FROM t
"""


_SQL_TOKS = f"string_split({_SQL_NORM}, ' ')"
_SQL_EN = "['the','and','of','to','a','in','is','it','that','for']"

SQL_TEXT_STATS = f"""
SELECT doc_id,
       CAST(len({_SQL_TOKS}) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe_tokens,
       CAST(FLOOR(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 100.0 /
            greatest(len(text), 1)) AS BIGINT) AS alpha_pct,
       CAST(FLOOR(len(list_filter({_SQL_TOKS}, t -> list_contains({_SQL_EN}, t))) * 100.0 /
            greatest(len({_SQL_TOKS}), 1)) AS BIGINT) AS stopword_pct,
       CAST(FLOOR(
            0.3 * (least(len(text), 500) * 100 / 500)
          + 0.3 * FLOOR(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 100.0 / greatest(len(text), 1))
          + 0.3 * least(FLOOR(len(list_filter({_SQL_TOKS}, t -> list_contains({_SQL_EN}, t))) * 100.0 /
                        greatest(len({_SQL_TOKS}), 1)) * 4, 100)
          + 0.1 * (100 - least(FLOOR(len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) * 100.0 /
                        greatest(len(text), 1)) * 5, 100))
       ) AS BIGINT) AS quality,
       md5({_SQL_NORM}) AS fingerprint
FROM documents
"""


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality score: per-doc mean unigram log-probability
    under the corpus's own unigram LM (the CCNet-style perplexity-filter
    signal).  Term-frequency shuffle + token→frequency join + doc agg —
    see operators/text.py: unigram_logprob for the 100-TB shape."""
    # explode+agg: partial-agg-first — fan-out measured as pure cost
    return text.unigram_logprob(_docs(spark, sf_dir, fan_out=False))


SQL_UNIGRAM_LOGPROB = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split({_SQL_NORM}, ' ')) AS tok
    FROM documents
),
tf AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT sum(c) AS s FROM tf)
SELECT doc_id,
       round(avg(ln(tf.c / tot.s)), 3) AS avg_logprob,
       count(*) AS n_tokens
FROM toks JOIN tf USING (tok), tot
GROUP BY doc_id
"""


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequent 3-grams (boilerplate detection before dedup)."""
    d = _docs(spark, sf_dir, fan_out=False)  # explode+agg: partial-agg-first
    out = text.top_ngrams(d, "text", n=3, k=20, id_col="doc_id")
    return out.select(
        F.col("rank").cast("int").alias("rank"),
        "ngram",
        F.col("doc_freq").cast("long").alias("doc_freq"),
        F.col("total_freq").cast("long").alias("total_freq"),
    )


SQL_TOP_NGRAMS = f"""
WITH g AS (SELECT doc_id, {_SQL_NORM} AS t FROM documents),
toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM g),
grams AS (
    SELECT doc_id,
           unnest(CASE WHEN len(w) - 2 < 1 THEN []
                  ELSE list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS ngram
    FROM toks
),
agg AS (
    SELECT ngram, COUNT(*) AS total_freq, COUNT(DISTINCT doc_id) AS doc_freq
    FROM grams GROUP BY ngram
)
SELECT CAST(row_number() OVER (ORDER BY total_freq DESC, ngram ASC) AS INT) AS rank,
       ngram, doc_freq, total_freq
FROM agg
ORDER BY total_freq DESC, ngram ASC
LIMIT 20
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", text.lang_id(F.col("text")).alias("lang_guess")
    )


def _sql_lang_score(lang_words: list[str]) -> str:
    arr = "[" + ",".join(f"'{w}'" for w in lang_words) + "]"
    return f"len(list_filter({_SQL_TOKS}, t -> list_contains({arr}, t)))"


def _sql_lang_id() -> str:
    from commons_codec_spark.operators.text import LANG_STOPWORDS

    langs = list(LANG_STOPWORDS)
    scores = {lg: _sql_lang_score(ws) for lg, ws in LANG_STOPWORDS.items()}
    whens = []
    for lg in langs:
        conds = [f"{scores[lg]} > 0"]
        for other in langs[: langs.index(lg)]:
            conds.append(f"{scores[lg]} > {scores[other]}")
        for other in langs[langs.index(lg) + 1 :]:
            conds.append(f"{scores[lg]} >= {scores[other]}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lg}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


SQL_LANG_ID = f"""
SELECT doc_id, {_sql_lang_id()} AS lang_guess FROM documents
"""


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data shape in one plan: quality gate ->
    lang-ID -> exact-dedup -> per-lang yield.  One scan; dedup counted as
    COUNT(DISTINCT fingerprint) per language (identical normalized text
    always language-IDs identically, so fingerprints never straddle
    languages) — partial-aggregated map-side, no window, no self-join.
    Runs over the duplicate-augmented corpus so the dedup stage has
    actual work."""
    d = _augmented_docs(spark, sf_dir)
    t = F.col("text")
    stats = d.select(
        "doc_id",
        text.quality_score(t).alias("quality"),
        text.md5_fingerprint(t).alias("fingerprint"),
        text.lang_id(t).alias("lang_guess"),
    )
    cand = stats.filter(F.col("quality") >= 35)
    return (
        cand.groupBy("lang_guess")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.countDistinct("fingerprint").cast("long").alias("n_curated"),
            F.floor(F.avg("quality")).cast("long").alias("avg_quality"),
        )
    )


_SQL_QUALITY = f"""CAST(FLOOR(
            0.3 * (least(len(text), 500) * 100 / 500)
          + 0.3 * FLOOR(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 100.0 / greatest(len(text), 1))
          + 0.3 * least(FLOOR(len(list_filter({_SQL_TOKS}, t -> list_contains({_SQL_EN}, t))) * 100.0 /
                        greatest(len({_SQL_TOKS}), 1)) * 4, 100)
          + 0.1 * (100 - least(FLOOR(len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) * 100.0 /
                        greatest(len(text), 1)) * 5, 100))
       ) AS BIGINT)"""

SQL_CORPUS_CURATION = f"""
WITH s AS (
    SELECT doc_id,
           {_SQL_QUALITY} AS quality,
           md5({_SQL_NORM}) AS fingerprint,
           {_sql_lang_id()} AS lang_guess
    FROM ({_SQL_AUGMENTED})
)
SELECT lang_guess,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(COUNT(DISTINCT fingerprint) AS BIGINT) AS n_curated,
       CAST(FLOOR(AVG(quality)) AS BIGINT) AS avg_quality
FROM s
WHERE quality >= 35
GROUP BY lang_guess
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling: keep 100% of src0 docs,
    20% of src1, 5% of everything else — membership is a pure hash
    filter (no shuffle, no state), so the same rows are kept on any
    cluster size and a raised fraction is a superset."""
    from commons_codec_spark.operators.sampling import stratified_sample

    d = _docs(spark, sf_dir, fan_out=False)  # filter+agg only
    out = stratified_sample(
        d, "doc_id", "source", {"src0": 1.0, "src1": 0.2},
        default_fraction=0.05, seed=7,
    )
    return out.groupBy("source").agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
    )


SQL_STRATIFIED_SAMPLE = """
WITH reduced AS (
    SELECT doc_id, source, (doc_id + 7) % 4294967296 AS a32
    FROM documents
),
hashed AS (
    -- overflow-safe split form of ((doc_id+7)*2654435761) mod 2^32:
    -- 2041643008 = (2654435761 * 2^16) mod 2^32 (see operators/sampling.py)
    SELECT doc_id, source,
           (((a32 & 65535) * 2654435761 + (a32 >> 16) * 2041643008)
            % 4294967296) / 4294967296.0 AS u,
           CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.2
                ELSE 0.05 END AS frac
    FROM reduced
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM hashed WHERE u < frac
GROUP BY source
"""


PIPELINE_QUERIES = {
    "corpus_curation": (q_corpus_curation, SQL_CORPUS_CURATION),
    "corpus_stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_DEDUP_MINHASH),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_DEDUP_NGRAM),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "dedup_clusters_star": (q_dedup_clusters_star, SQL_DEDUP_CLUSTERS),
    "dedup_simhash": (q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "similarity_cosine_topk": (q_cosine_topk, SQL_COSINE_TOPK),
    "text_stats": (q_text_stats, SQL_TEXT_STATS),
    "text_redact": (q_text_redact, SQL_TEXT_REDACT),
    "text_repetition": (q_text_repetition, SQL_TEXT_REPETITION),
    "text_chunking": (q_text_chunking, SQL_TEXT_CHUNKING),
    "corpus_packing": (q_corpus_packing, SQL_CORPUS_PACKING),
    "text_lang_id": (q_lang_id, SQL_LANG_ID),
    "text_top_ngrams": (q_top_ngrams, SQL_TOP_NGRAMS),
    "text_unigram_logprob": (q_unigram_logprob, SQL_UNIGRAM_LOGPROB),
}

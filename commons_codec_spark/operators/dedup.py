"""Deduplication operators for training-data pipelines.

Five families, all engine-portable (md5-based hashing so a SQL oracle can
reproduce them bit-for-bit; no engine-specific hash functions):

* exact           — group by md5(normalized text)
* minhash + LSH   — word-shingle minhash signatures, banded bucket join,
                    exact-Jaccard verification of candidates
* n-gram Jaccard  — exact word-3-gram Jaccard for given candidate pairs
* simhash         — 16-bit md5-derived simhash + Hamming-ball pairs
* embedding cosine— near-dup by quantized-integer cosine (see similarity)

Scale notes (100 TB): the LSH path is the only one that avoids O(n²) —
its shuffle volume is O(n · bands) and the verify join only touches
bucket-colliding pairs.  Signatures are built with higher-order column
functions (JVM, one pass); the band join is a self-equi-join that AQE
can split on skewed buckets (identical boilerplate text is exactly such
a hot bucket).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from commons_codec_spark.colutil import let
from commons_codec_spark.operators.text import normalize

# ---------------------------------------------------------------------------
# shingles + exact jaccard
# ---------------------------------------------------------------------------


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (sorted for determinism).

    The token array is let-bound: naively referencing ``split(normalize(…))``
    inside the gram lambda would re-run the regex+split per element.
    """

    def build(toks: Column) -> Column:
        count = F.size(toks) - (n - 1)
        grams = F.when(count >= 1, F.transform(
            F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )).otherwise(F.array().cast("array<string>"))
        return F.array_sort(F.array_distinct(grams))

    return let(F.split(normalize(text), " "), build)


def jaccard_pct(a: Column, b: Column) -> Column:
    """floor(100 * |a∩b| / |a∪b|) over distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.floor(inter * 100.0 / F.greatest(union, F.lit(1))).cast("long")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_flags(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Mark every row whose normalized text already appeared under a lower id.

    One hash-shuffle on the fingerprint; keeps all columns + ``content_md5``
    and ``is_dup``.
    """
    from pyspark.sql import Window

    fp = F.md5(normalize(F.col(text_col)))
    w = Window.partitionBy("content_md5")
    return (
        df.withColumn("content_md5", fp)
        .withColumn("__keeper", F.min(id_col).over(w))
        .withColumn("is_dup", (F.col(id_col) != F.col("__keeper")).cast("boolean"))
        .drop("__keeper")
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, num_hashes: int = 8) -> list[Column]:
    """K minhashes: min over shingles of md5(k|shingle).  md5 keeps the
    signature reproducible in any engine (vs engine-local xxhash)."""
    return [
        F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{k}|"), s)))
        ).alias(f"mh{k}")
        for k in range(num_hashes)
    ]


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    verify_threshold_pct: int = 50,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification.

    Pipeline: shingle → K minhashes → bands of ``band_size`` → explode to
    (band_key, id) → self-join per band → distinct candidate pairs →
    exact Jaccard ≥ threshold.  Returns (a, b, jaccard_pct), a < b.
    """
    # Materialize (id, shingles) once: it feeds the signature build and the
    # two verify-side re-attach joins below (the 100 TB shape is the same —
    # a persisted shingle table built in one pass).
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), shingle_n).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .localCheckpoint()
    )
    sigs = sh.select("id", *minhash_signature(F.col("sh"), num_hashes))

    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    *[F.col(f"mh{b * band_size + j}") for j in range(band_size)],
                )
            )
            for b in range(n_bands)
        ]
    )
    # The band self-join and the pair dedup move (band, id) pairs ONLY —
    # shuttling the full shingle arrays through the join (and twice more
    # through dropDuplicates) was the #1 shuffle-volume hotspot; signatures
    # re-attach to the compact distinct pair list afterwards.
    banded = sigs.select("id", F.explode(bands).alias("band"))
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), on="band")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    cand = pairs.join(
        sh.select(F.col("id").alias("a"), F.col("sh").alias("sa")), on="a"
    ).join(sh.select(F.col("id").alias("b"), F.col("sh").alias("sb")), on="b")
    return (
        cand.withColumn("jaccard_pct", jaccard_pct(F.col("sa"), F.col("sb")))
        .filter(F.col("jaccard_pct") >= verify_threshold_pct)
        .select("a", "b", "jaccard_pct")
    )


# ---------------------------------------------------------------------------
# near-dup clusters (connected components over candidate pairs)
# ---------------------------------------------------------------------------


def dedup_clusters(pairs: DataFrame, max_iters: int = 25) -> DataFrame:
    """Connected components over near-dup pairs: (id, cluster_id).

    ``cluster_id`` is the minimum id in the component — the canonical
    "keeper" a dedup pipeline retains.  Min-label propagation: each round
    every node takes the min of its own and its neighbors' labels; the
    loop is driver-side but each step is a distributed join+aggregate
    over the (small) candidate-pair graph — no per-node collect.
    Converges in O(component diameter) rounds; near-dup clusters are
    shallow (copies of copies), so 3-5 rounds is typical.  Each round
    ``localCheckpoint``s to cut lineage (iterative plans otherwise grow
    exponentially).  Raises if ``max_iters`` rounds don't converge.

    Convergence probe: labels are POINTWISE MONOTONE non-increasing
    (``new = min(own, neighbors)`` includes the node's own old label), so
    an unchanged per-round ``sum(lbl)`` is EXACT proof of an unchanged
    label vector — and the sum rides the round's ``localCheckpoint``
    materialization as an ``Observation``, so the probe costs NO separate
    pass at all (the earlier new-vs-old join + count was a second shuffle
    of the full label set per round, at billions of nodes the dominant
    per-round cost).  Decimal
    sum: ids can be 2^63-scale and ANSI mode would throw on a long-sum
    overflow.
    """
    from pyspark.sql import Observation

    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )

    # The probe rides the round's localCheckpoint materialization as an
    # Observation instead of a separate aggregation job: one pass over the
    # label set per round where there were two — at billions of nodes the
    # probe WAS a second full scan.  coalesce: an all-NULL metrics row
    # (empty label set) fails the JVM→Python row conversion.
    def observed_sum(lbls: DataFrame):
        obs = Observation()
        ck = lbls.observe(
            obs,
            F.coalesce(
                F.sum(F.col("lbl").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("s"),
        ).localCheckpoint()
        return ck, obs.get["s"]

    labels, prev_sum = observed_sum(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("lbl"))
    )
    for _ in range(max_iters):
        msgs = edges.join(
            labels.withColumnRenamed("id", "dst"), on="dst"
        ).select(F.col("src").alias("id"), "lbl")
        new_labels, new_sum = observed_sum(
            labels.unionAll(msgs).groupBy("id").agg(F.min("lbl").alias("lbl"))
        )
        labels = new_labels
        if new_sum == prev_sum:
            return labels.select("id", F.col("lbl").alias("cluster_id"))
        prev_sum = new_sum
    raise RuntimeError(f"dedup_clusters did not converge in {max_iters} rounds")


def dedup_clusters_star(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components via large-star / small-star alternation.

    Same contract as :func:`dedup_clusters` — (id, cluster_id) with the
    component minimum as the label — but converging in **O(log n)**
    rounds instead of O(component diameter): the scale path for graphs
    with long chains (e.g. chained near-duplicates A≈B≈C≈…), where
    min-label propagation needs one round per hop.  Each round is two
    distributed groupBy+join passes (large-star hangs every
    higher-numbered neighbor off its neighborhood minimum; small-star
    does the same for the lower-or-equal neighborhood), edge count
    monotonically non-increasing toward a star per component.  The loop
    is driver-side like the min-label variant, but the round count — the
    per-round job-scheduling overhead the driver loop costs — is
    logarithmic, which is what matters at billions of edges.

    Convergence probe: an order-invariant signature —
    ``(count, bit_xor(xxhash64(u,v)), sum(xxhash64 as decimal))`` — that
    rides each round's ``localCheckpoint`` materialization as an
    ``Observation`` (no separate aggregation job),
    compared against the previous round's summary.  Edge sets are
    ``distinct`` by construction, so an unchanged order-invariant summary
    means an unchanged set (up to a 2^-64-ish collision); the earlier
    probe ran TWO ``exceptAll`` anti-joins, each a full shuffle of both
    edge sets, doubling per-round cost in exactly the billions-of-edges
    regime this variant exists for.  A signature match is then CONFIRMED
    by one ``exceptAll`` pass over the final (star-contracted, smallest)
    edge set before declaring convergence — paid once per run, not per
    round — so a hash collision can delay a round but can never
    silently return wrong cluster assignments.

    Crossover vs :func:`dedup_clusters`: on SHALLOW graphs (typical
    near-dup clusters — copies of copies, diameter 2-4) min-label wins
    because star pays more fixed rounds of two groupBy+join passes each;
    star wins when components chain (diameter ≫ log n).  Measured at
    sf0.1 (shallow): min-label 4.5-6.0 s, star 5.0-6.5 s across windows —
    the signature probe cut star's gap from ~1.5 s (two exceptAll rounds)
    to ~0.5 s (pure fixed-round cost).  Keep both, pick by graph shape.
    """

    def bidir(e: DataFrame) -> DataFrame:
        return e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def large_star(e: DataFrame) -> DataFrame:
        b = bidir(e)
        mins = b.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least(F.col("mv"), F.col("u")).alias("m")
        )
        return (
            b.filter(F.col("v") > F.col("u"))
            .join(mins, on="u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient each edge toward the smaller endpoint, then hang every
        # node (and its <= neighbors) off the neighborhood minimum
        le = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = le.groupBy("u").agg(F.min("v").alias("m"))
        hang = (
            le.join(mins, on="u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        selfed = mins.select(F.col("u"), F.col("m").alias("v"))
        return (
            hang.unionAll(selfed)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    from pyspark.sql import Observation

    # The signature rides each round's localCheckpoint materialization as
    # an Observation instead of a separate aggregation job: one pass over
    # the edge set per round where there were two — the probe WAS a second
    # full scan of the edges, in exactly the billions-of-edges regime this
    # variant exists for.  coalesce: an all-NULL metrics row (empty edge
    # set) fails the JVM→Python row conversion.
    def observed_checkpoint(e: DataFrame):
        h = F.xxhash64("u", "v")
        obs = Observation()
        ck = e.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(h), F.lit(0)).alias("x"),
            # decimal(38,0): ANSI mode is on session-wide and a plain long
            # sum of 2^63-scale hashes overflows (and would throw)
            F.coalesce(
                F.sum(h.cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")
            ).alias("s"),
        ).localCheckpoint()
        m = obs.get
        return ck, (m["n"], m["x"], m["s"])

    edges, sig = observed_checkpoint(
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = bidir(edges).select(F.col("u").alias("id")).distinct().localCheckpoint()

    for _ in range(max_iters):
        new_edges, new_sig = observed_checkpoint(small_star(large_star(edges)))
        prev_edges, edges = edges, new_edges
        unchanged, sig = new_sig == sig, new_sig
        if unchanged:
            # confirm the probabilistic signature exactly: both sets are
            # distinct with equal counts (from the matched summaries), so
            # one one-sided exceptAll proves set equality.  Runs once per
            # call; a collision (≈2^-64) just costs extra rounds.
            if not prev_edges.exceptAll(edges).isEmpty():
                continue
            # fixpoint: every component is a star rooted at its minimum
            labels = bidir(edges).groupBy(F.col("u").alias("id")).agg(
                F.min("v").alias("nbr_min")
            )
            return nodes.join(labels, on="id", how="left").select(
                "id",
                F.least(F.coalesce("nbr_min", F.col("id")), F.col("id")).alias(
                    "cluster_id"
                ),
            )
    raise RuntimeError(f"dedup_clusters_star did not converge in {max_iters} rounds")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash16(text: Column) -> Column:
    """16-bit simhash over distinct whitespace tokens.

    Bit b is set when the majority of token md5s have hex digit b in
    [8-f] (i.e. that digit's high bit set).  md5-derived so the identical
    integer is computable in SQL; 16 bits keeps the oracle tractable while
    the construction generalizes to 64.
    """
    toks = F.array_distinct(F.split(normalize(text), " "))

    def build(hashes: Column) -> Column:
        total = F.size(hashes)
        bit_cols = []
        for b in range(SIMHASH_BITS):
            ones = F.size(
                F.filter(hashes, lambda h: F.substring(h, b + 1, 1).isin(*"89abcdef"))
            )
            bit_cols.append(F.when(ones * 2 > total, F.lit(1 << b)).otherwise(F.lit(0)))
        out = bit_cols[0]
        for c in bit_cols[1:]:
            out = out + c
        return out.cast("long")

    # let-bound: the 16 bit tests + total each reference the hash array
    return let(F.transform(toks, lambda t: F.md5(t)), build)


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs within a Hamming ball of the 16-bit simhash.

    Blocking: two 8-bit halves — pairs within hamming ≤ max_hamming < 8+1
    share at least one identical half (pigeonhole), so a half-key join
    finds all of them without O(n²).
    """
    sh = df.select(F.col(id_col).alias("id"), simhash16(F.col(text_col)).alias("sh"))
    halves = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                F.concat(F.lit("lo:"), (F.col("sh") % 256).cast("string")),
                F.concat(F.lit("hi:"), (F.col("sh") / 256).cast("long").cast("string")),
            )
        ).alias("half"),
    )
    cand = (
        halves.alias("l")
        .join(halves.alias("r"), on="half")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a"), F.col("r.id").alias("b"),
            F.col("l.sh").alias("sa"), F.col("r.sh").alias("sb"),
        )
        .dropDuplicates(["a", "b"])
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )

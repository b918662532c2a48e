"""Dedup / similarity / text / multimodal operator tests."""

import pyspark.sql.functions as F
import pytest

from commons_codec_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different text about spark engines and data"),
        (5, "der hund und die katze sind nicht zu haus"),  # German
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r.doc_id: r.is_dup for r in dedup.exact_dedup_flags(docs, "doc_id", "text").collect()}
    assert out == {1: False, 2: True, 3: False, 4: False, 5: False, 6: False}


def test_word_shingles_and_jaccard(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    sh = df.select(dedup.word_shingles(F.col("t")).alias("s")).collect()[0].s
    assert sh == ["a b c", "b c d"]
    j = spark.range(1).select(
        dedup.jaccard_pct(
            F.array(F.lit("x"), F.lit("y"), F.lit("z")), F.array(F.lit("y"), F.lit("z"))
        ).alias("j")
    ).collect()[0].j
    assert j == 66  # floor(2/3 * 100)


def test_minhash_lsh_finds_near_dups(docs):
    pairs = dedup.lsh_candidate_pairs(docs, "doc_id", "text", verify_threshold_pct=50)
    got = {(r.a, r.b): r.jaccard_pct for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] == 100
    assert (1, 3) in got and 50 <= got[(1, 3)] < 100
    assert all(a != 4 and b != 4 for a, b in got)


def test_simhash_properties(docs):
    out = {r.doc_id: r.simhash for r in docs.select(
        "doc_id", dedup.simhash16(F.col("text")).alias("simhash")).collect()}
    assert out[1] == out[2]  # identical text, identical hash
    assert 0 <= out[1] < 2**16
    ham_13 = bin(out[1] ^ out[3]).count("1")
    ham_14 = bin(out[1] ^ out[4]).count("1")
    assert ham_13 <= ham_14  # near-dup closer than unrelated


def test_simhash_pairs_blocking(docs):
    pairs = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3)
    got = {(r.a, r.b): r.hamming for r in pairs.collect()}
    assert got.get((1, 2)) == 0


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 8)).astype("float32")
    base[7] = base[0] * 1.01 + 0.001  # near-dup of vector 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(vectors):
    probes = vectors.filter(F.col("vec_id") == 0)
    out = similarity.brute_force_topk(vectors, probes, k=3).collect()
    assert len(out) == 3
    assert out[0].neighbor_id == 7 and out[0].rank == 1  # the planted near-dup
    assert out[0].cos2_bp > 9990


def test_lsh_topk_recall(vectors):
    probes = vectors.filter(F.col("vec_id") % 4 == 0)
    exact = similarity.brute_force_topk(vectors, probes, k=3)
    approx = similarity.lsh_topk(vectors, probes, dim=8, k=3, n_bits=2)
    e = {(r.probe_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.probe_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.4  # 2-bit LSH on dim-8 toy data; scale path sanity
    # the planted near-pair must land in the same bucket (high cosine)
    assert any(p == 0 and n == 7 for p, n in a)


def test_ivf_topk_recall(vectors):
    probes = vectors.filter(F.col("vec_id") % 4 == 0)
    exact = similarity.brute_force_topk(vectors, probes, k=3)
    approx = similarity.ivf_topk(
        vectors, probes, dim=8, k=3, centroid_mod=3, nprobe=2
    )
    e = {(r.probe_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.probe_id, r.neighbor_id) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.4  # coarse cells on toy data
    ranks = {}
    for r in approx.collect():
        ranks.setdefault(r.probe_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in ranks.values())


def test_cosine_near_dup_pairs(vectors):
    pairs = similarity.cosine_near_dup_pairs(vectors, threshold_bp=9900, dim=8, n_bits=2)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert (0, 7) in got


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(1, "The quick fox! It is fast, and it is brown.")], "id long, t string"
    )
    row = df.select(
        text.ws_token_count(F.col("t")).alias("ws"),
        text.bpe_ish_token_count(F.col("t")).alias("bpe"),
        text.alpha_ratio_pct(F.col("t")).alias("alpha"),
        text.lang_id(F.col("t")).alias("lang"),
        text.md5_fingerprint(F.col("t")).alias("fp"),
        text.quality_score(F.col("t")).alias("q"),
    ).collect()[0]
    assert row.ws == 10
    assert row.bpe == 13  # 10 words + 3 punctuation marks
    assert 70 <= row.alpha <= 85
    assert row.lang == "en"
    assert len(row.fp) == 32
    assert 0 <= row.q <= 100


def test_lang_id_german(docs):
    out = {r.doc_id: r.lang for r in docs.select(
        "doc_id", text.lang_id(F.col("text")).alias("lang")).collect()}
    assert out[5] == "de" and out[1] == "en" and out[6] == "und"


def test_rolling_fingerprints_overlap(spark):
    df = spark.createDataFrame(
        [
            (1, "abcdefghijklmnopqrstuvwxyz"),
            (2, "abcdefghijklmnopqrstuvwxyz123"),  # shared prefix
            (3, "zyxwvutsrqponmlkjihgfedcba"),
        ],
        "id long, t string",
    )
    fps = {r.id: set(r.fp) for r in df.select(
        "id", text.rolling_fingerprints(F.col("t")).alias("fp")).collect()}
    shared_12 = len(fps[1] & fps[2]) / len(fps[1] | fps[2])
    shared_13 = len(fps[1] & fps[3]) / len(fps[1] | fps[3])
    assert shared_12 > shared_13


def test_multimodal_features_and_frames(spark):
    rows = [
        (1, b"fake-image-bytes", ("image/png", 4, 4, None, None)),
        (2, b"fake-video-bytes", ("video/mp4", 16, 9, 3500, None)),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, media binary, media_meta struct<mime:string,width:int,height:int,duration_ms:long,sample_rate:int>",
    )
    feats = multimodal.extract_features(df, dim=16).collect()
    assert all(len(r.features) == 16 for r in feats)
    again = multimodal.extract_features(df, dim=16).collect()
    assert [r.features for r in feats] == [r.features for r in again]  # deterministic

    frames = multimodal.sample_frames(df.filter(F.col("id") == 2), every_ms=1000).collect()
    assert [r.frame_ts_ms for r in frames] == [0, 1000, 2000, 3000]
    assert all(isinstance(r.frame, (bytes, bytearray)) for r in frames)

    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        multimodal.extract_features(df, dim=4, use_fake_decoder=False).collect()


def test_sessionize_gap_semantics(spark):
    from commons_codec_spark.operators import sessions

    rows = [
        ("u", "2024-01-01 00:00:00", 1),
        ("u", "2024-01-01 00:10:00", 2),   # exactly at the gap: continues
        ("u", "2024-01-01 00:20:01", 3),   # 601s: new session
        ("v", "2024-01-01 00:00:00", 4),
    ]
    df = spark.createDataFrame(rows, "user string, ts string, event_id long")
    out = sessions.sessionize(df, ["user"], "ts", gap_sec=600, tiebreak_col="event_id")
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0}

    stats = sessions.session_stats(df, ["user"], "ts", gap_sec=600, tiebreak_col="event_id")
    srow = {(r.user, r.session_id): (r.n_events, r.duration_us) for r in stats.collect()}
    assert srow[("u", 0)] == (2, 600_000_000)
    assert srow[("u", 1)] == (1, 0)
    assert srow[("v", 0)] == (1, 0)


def test_dedup_clusters_connected_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (3, 4)], "a long, b long"
    )
    out = {r.id: r.cluster_id for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_clusters_deep_chain_sum_probe(spark):
    """The monotone-sum convergence probe must not stop early: a long
    chain needs one round per hop for the min label to propagate, and
    every intermediate round changes the label sum (labels are pointwise
    non-increasing, so sum-unchanged <=> vector-unchanged — exact).
    Also pins the large-id regime: the probe sums as decimal, so 2^62-
    scale labels must neither overflow (ANSI would throw) nor collide."""
    big = 1 << 62
    chain = [(big + i, big + i + 1) for i in range(12)]
    pairs = spark.createDataFrame(chain, "a long, b long")
    out = {r.id: r.cluster_id for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {big + i: big for i in range(13)}


def test_dedup_clusters_empty_pairs(spark):
    """Both CC variants on an empty pair set: the convergence probe now
    rides each round's localCheckpoint as an Observation whose metrics
    must coalesce NULL aggregates (sum/bit_xor over zero rows) — an
    all-NULL metrics row fails the JVM→Python conversion outright."""
    empty = spark.createDataFrame([], "a long, b long")
    assert dedup.dedup_clusters(empty).count() == 0
    assert dedup.dedup_clusters_star(empty).count() == 0


def test_top_ngrams(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on a chair"),
        (3, "dogs bark loudly"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.top_ngrams(df, "text", n=3, k=3, id_col="doc_id").collect()
    # freq-2 grams tie; alphabetical tie-break ranks "cat sat on" first
    assert out[0].ngram == "cat sat on" and out[0].rank == 1
    assert out[1].ngram == "the cat sat" and out[1].rank == 2
    assert out[0].total_freq == 2 and out[0].doc_freq == 2
    assert len(out) == 3
    # plan hygiene: global top-k must be TakeOrdered, not a one-partition sort
    plan = text.top_ngrams(df, "text", n=3, k=3, id_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_deterministic_sampling_properties(spark):
    """Membership is a pure function of (seed, id): stable across
    partitionings, and a larger fraction keeps a superset (corpus can
    grow without resampling the old part)."""
    import pyspark.sql.functions as F

    from commons_codec_spark.operators import sampling

    df = spark.range(0, 5000).withColumn(
        "stratum", F.when(F.col("id") % 3 == 0, "a").otherwise("b")
    )
    small = {r[0] for r in sampling.sample_fraction(df, "id", 0.1, seed=5).collect()}
    small2 = {
        r[0]
        for r in sampling.sample_fraction(df.repartition(7), "id", 0.1, seed=5).collect()
    }
    big = {r[0] for r in sampling.sample_fraction(df, "id", 0.3, seed=5).collect()}
    assert small == small2  # partitioning-independent
    assert small < big  # fraction monotonicity: strict superset
    assert abs(len(small) / 5000 - 0.1) < 0.02  # roughly calibrated

    strat = sampling.stratified_sample(
        df, "id", "stratum", {"a": 1.0}, default_fraction=0.0, seed=5
    )
    rows = strat.groupBy("stratum").count().collect()
    got = {r["stratum"]: r["count"] for r in rows}
    assert got.get("a") == df.filter(F.col("stratum") == "a").count()
    assert "b" not in got

    plan = strat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter: no shuffle


def test_sampling_large_ids_no_overflow(spark):
    """ADVICE r2: snowflake-scale ids (> 2^31) must hash without
    ARITHMETIC_OVERFLOW under ANSI mode, and the split-multiply form must
    equal the mathematical ((id+seed)*K) mod 2^32 formula."""
    from commons_codec_spark.operators import sampling

    ids = [0, 1, 5000, 3_470_000_000, 2**33 + 17, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["u"]
        for r in df.select(
            "id", sampling.uniform_from_id(F.col("id"), seed=7).alias("u")
        ).collect()
    }
    for i in ids:
        expect = (((i + 7) % 2**32) * 2654435761 % 2**32) / 2**32
        assert abs(got[i] - expect) < 1e-12, (i, got[i], expect)


def test_dedup_clusters_star_equals_min_label(spark):
    """Large-star/small-star must produce exactly the min-label clusters,
    including on a long chain (min-label's worst case: O(n) rounds) and
    random multi-component graphs."""
    import random

    from commons_codec_spark.operators import dedup as dd

    rng = random.Random(3)
    # a 40-node chain + random components + an isolated pair
    edges = [(i, i + 1) for i in range(100, 140)]
    for base in (200, 300, 400):
        nodes = [base + i for i in range(rng.randint(3, 9))]
        for _ in range(len(nodes) + 2):
            a, b = rng.sample(nodes, 2)
            edges.append((a, b))
    edges.append((900, 901))
    pairs = spark.createDataFrame(edges, "a long, b long")

    star = {
        (r["id"], r["cluster_id"])
        for r in dd.dedup_clusters_star(pairs).collect()
    }
    minlbl = {
        (r["id"], r["cluster_id"])
        for r in dd.dedup_clusters(pairs, max_iters=64).collect()
    }
    assert star == minlbl
    # chain collapses to its minimum in logarithmic rounds
    assert {(i, 100) for i in range(100, 141)} <= star


def test_text_redaction(spark):
    """URL pass runs first so an email-like userinfo inside a URL is
    consumed by <URL>; standalone emails and IPv4 literals get their own
    tokens; counts are computed on the pre-redaction text."""
    rows = [
        (1, "mail me at bob@corp.example.com or see https://u:pw@host.example/x"),
        (2, "server at 192.168.0.1 and 10.0.0.2, version 1.2"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            text.redact(F.col("text")).alias("clean"),
            *text.redaction_counts(F.col("text")),
        ).collect()
    }
    assert out[1]["clean"] == "mail me at <EMAIL> or see <URL>"
    # counts are over the PRE-redaction text: the URL's userinfo also
    # matches the email pattern, so email_hits sees both
    assert out[1]["email_hits"] == 2 and out[1]["url_hits"] == 1
    assert out[2]["clean"] == "server at <IP> and <IP>, version 1.2"
    assert out[2]["ipv4_hits"] == 2
    assert out[3]["clean"] == rows[2][1]
    plan = df.select(text.redact(F.col("text")))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_unigram_logprob_hand_computed(spark):
    """Tiny corpus with hand-computable probabilities: a:2 b:2 c:1 of 5
    tokens.  doc1 = 'a a b' -> mean(ln .4, ln .4, ln .4) = ln .4 = -0.916;
    doc2 = 'b c' -> mean(ln .4, ln .2) = -1.263 (3dp)."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["avg_logprob"], r["n_tokens"])
        for r in text.unigram_logprob(docs).collect()
    }
    assert got == {1: (-0.916, 3), 2: (-1.263, 2)}


def test_repetition_ratios(spark):
    rows = [
        (1, "a a a a"),                # one distinct of four
        (2, "all words here differ"),  # no repetition
        (3, "spam spam spam eggs"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r
        for r in df.select("id", *text.repetition_ratios(F.col("text"))).collect()
    }
    assert out[1]["dup_token_pct"] == 75 and out[1]["dup_char_pct"] == 75
    assert out[2]["dup_token_pct"] == 0 and out[2]["dup_char_pct"] == 0
    # 4 tokens, 2 distinct -> 50%; chars 16 vs 8 -> 50%
    assert out[3]["dup_token_pct"] == 50 and out[3]["dup_char_pct"] == 50


def test_chunk_by_tokens_boundaries(spark):
    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, toks), (2, "short text")], "doc_id long, text string")
    out = text.chunk_by_tokens(df, "text", chunk_tokens=4, overlap=1)
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["chunk_n_tokens"])
        for r in out.collect()
    )
    # stride 3 over 10 tokens: starts 0,3,6,9
    assert [r[1] for r in rows if r[0] == 1] == [0, 1, 2, 3]
    assert rows[0][2] == "t0 t1 t2 t3"
    assert rows[1][2] == "t3 t4 t5 t6"  # 1-token overlap
    assert rows[3][2] == "t9" and rows[3][3] == 1  # short tail chunk
    assert [r for r in rows if r[0] == 2] == [(2, 0, "short text", 2)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        text.chunk_by_tokens(df, "text", chunk_tokens=4, overlap=4)


def test_pack_next_fit_properties(spark):
    from commons_codec_spark.operators.packing import pack_next_fit

    rows = [(i, 100 + (i * 37) % 900) for i in range(200)]
    rows.append((1000, 9999))  # bigger than the whole budget
    df = spark.createDataFrame(rows, "doc_id long, sz long")
    packed = pack_next_fit(df, "doc_id", "sz", budget=2000, n_shards=4)
    got = packed.collect()
    shards = {}
    for r in got:
        shards.setdefault(r["shard"], []).append(r)
    for shard, rs in shards.items():
        sizes = [r["sz"] for r in rs]
        bins = sorted({r["bin_id"] for r in rs})
        fill = {}
        for r in rs:
            fill[r["bin_id"]] = fill.get(r["bin_id"], 0) + r["sz"]
        if not any(r["oversize"] for r in rs):
            # without oversize docs the offset bins are contiguous...
            assert bins == list(range(len(bins))), shard
            # ...and every non-final bin is filled to at least
            # budget − (largest possible previous-doc overhang)
            for b in bins[:-1]:
                assert fill[b] >= 2000 - max(sizes), (shard, b)
    # oversize flagged
    assert any(r["oversize"] for r in got if r["doc_id"] == 1000)
    # determinism under repartitioning
    again = pack_next_fit(df.repartition(7), "doc_id", "sz", budget=2000, n_shards=4)
    a = sorted((r["doc_id"], r["shard"], r["bin_id"]) for r in got)
    b = sorted((r["doc_id"], r["shard"], r["bin_id"]) for r in again.collect())
    assert a == b

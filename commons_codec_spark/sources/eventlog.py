"""Deterministic synthetic CDC event log over the ``source_code`` table.

Shape per FIXTURES.md §2 (modeled on the reference's DynamoDB Streams / DMS
envelopes, ``tests/transform/test_dynamodb_cdc.py:21-180``): each event is

    event_id, op (insert|update|delete), schema_name, table_name,
    keys_json  — DynamoDB descriptor encoding of the (repo, path) key
    image      — descriptor-encoded NewImage JSON (NULL for deletes)
    commit_seq — global monotone ordering (stream position analog)
    batch_id   — micro-batch grouping for replay / kill-and-resume tests

Everything derives from (seed, i) via xxhash64/sha2 **inside column
expressions** — generation is distributed, JVM-side, and bit-reproducible
at any scale (bench generates millions of rows without driver involvement).

Skew is built in deliberately (north rule): event→key assignment follows a
power law (hot files get many updates) and key→repo assignment follows a
steeper one (hot repos own many files), so both the fold shuffle and the
merge join see realistic hot keys.

At-least-once delivery is simulated by emitting exact duplicates for ~2.7%
of events (same event_id and commit_seq, like a Lambda retry —
``/root/reference/CHANGES.md:20-24``).

``lang`` appears in images only from ``lang_cutoff`` onward — the additive
schema-evolution case the north rule requires.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

LANGS = ["py", "rs", "go", "js"]


def _u(seed: int, col, mod: int = 1_000_000):
    """Deterministic uniform in [0,1) from (seed, col)."""
    return F.pmod(F.xxhash64(F.lit(seed), col), mod) / mod


def generate_event_log(
    spark: SparkSession,
    n_events: int,
    n_keys: int | None = None,
    n_repos: int | None = None,
    seed: int = 42,
    batch_size: int = 100_000,
    lang_cutoff_frac: float = 0.6,
    key_skew: float = 2.5,
    repo_skew: float = 3.0,
    dup_every: int = 37,
    partitions: int | None = None,
    hot_key_frac: float | None = None,
    hot_key_id: int = 0,
) -> DataFrame:
    """Build the envelope DataFrame; pure column expressions, no Python.

    ``hot_key_frac``: route that fraction of ALL events to a single key
    (``hot_key_id``) on top of the power-law base — the adversarial
    single-hot-key regime the auto-salt path defends against (one repo
    receiving a third of the stream's change events).
    """
    n_keys = n_keys or max(n_events // 8, 16)
    n_repos = n_repos or max(n_keys // 100, 4)
    lang_cutoff = int(n_events * lang_cutoff_frac)

    df = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    # --- key / repo assignment (power-law skew)
    key_id = F.floor(F.pow(_u(seed, i), key_skew) * n_keys).cast("long")
    if hot_key_frac:
        key_id = F.when(
            _u(seed + 9, i) < float(hot_key_frac),
            F.lit(int(hot_key_id)).cast("long"),
        ).otherwise(key_id)
    repo_id = F.floor(F.pow(_u(seed + 1, key_id), repo_skew) * n_repos).cast("long")
    repo = F.format_string("repo-%04d", repo_id)
    path = F.format_string("src/m%02d/file_%07d.py", F.pmod(key_id, F.lit(97)), key_id)

    # --- op mix ~70/20/10
    r = F.pmod(F.xxhash64(F.lit(seed + 2), i), 100)
    op = (
        F.when(r < 70, F.lit("insert")).when(r < 90, F.lit("update")).otherwise(F.lit("delete"))
    )

    # --- payload fields, derived from (key, seq)
    commit_sha = F.substring(F.sha2(F.format_string("%d:%d", key_id, i), 256), 1, 40)
    body_len = (64 + F.pmod(F.xxhash64(F.lit(seed + 3), i), 400)).cast("int")
    body = F.substring(
        F.repeat(F.sha2(F.format_string("body:%d:%d", key_id, i), 256), 8), 1, body_len
    )
    content = F.format_string(
        "def f_%d(): return '%s'  # rev %d", key_id, body, i
    )
    size = F.length(content)
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod(key_id, 4) + 1).cast("int"))
    has_lang = i >= lang_cutoff

    keys_json = F.format_string(
        '{"repo":{"S":"%s"},"path":{"S":"%s"}}', repo, path
    )
    image_base = F.format_string(
        '{"repo":{"S":"%s"},"path":{"S":"%s"},"commit":{"S":"%s"},'
        '"content":{"S":"%s"},"size":{"N":"%d"}',
        repo, path, commit_sha, content, size,
    )
    image = F.concat(
        image_base,
        F.when(has_lang, F.format_string(',"lang":{"S":"%s"}', lang)).otherwise(F.lit("")),
        F.lit("}"),
    )

    out = df.select(
        F.format_string("evt-%012d", i).alias("event_id"),
        op.alias("op"),
        F.lit("public").alias("schema_name"),
        F.lit("source_code").alias("table_name"),
        keys_json.alias("keys_json"),
        F.when(op == "delete", F.lit(None).cast("string")).otherwise(image).alias("image"),
        i.alias("commit_seq"),
        F.floor(i / batch_size).alias("batch_id"),
    )

    # --- at-least-once: re-deliver ~1/dup_every events verbatim
    dups = out.filter(F.pmod(F.xxhash64(F.lit(seed + 5), F.col("commit_seq")), dup_every) == 0)
    return out.unionAll(dups)


#: Descriptor markers of the source_code image — feed to compile_direct_decoder.
SOURCE_CODE_COLUMNS = {
    "repo": "S",
    "path": "S",
    "commit": "S",
    "content": "S",
    "size": "N",
    "lang": "S",
}

#: Image columns before the lang cutover (schema-evolution start state).
SOURCE_CODE_COLUMNS_V0 = {k: v for k, v in SOURCE_CODE_COLUMNS.items() if k != "lang"}

"""Second wave of driver-contract queries: MongoDB Extended-JSON decode,
telemetry decoders, LSH-bucketed ANN, embedding near-dup, DMS control
plane, winnowing fingerprints, multimodal plumbing.

Same design as :mod:`commons_codec_spark.queries`: every query derives its
input deterministically from the shared testdata parquet so a DuckDB
oracle can compute the identical result (hash-exact: integers/strings
only where rounding is representation-sensitive).  Array-valued results
are exploded to scalar rows — the driver's canonicalizer sorts the result
in pandas, which cannot hash list cells.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from commons_codec_spark.functions import dms
from commons_codec_spark.functions.mongodb import decode_mongo_cdc
from commons_codec_spark.functions.telemetry import (
    decode_telemetry,
    readings_to_columns,
)
from commons_codec_spark.operators import multimodal, similarity, text
from commons_codec_spark.readers import read_table


def _t(
    spark: SparkSession, sf_dir: str, name: str, fan_out: bool = True
) -> DataFrame:
    # UTC pin + scan fan-out (single-row-group files scan as one task —
    # see commons_codec_spark.readers).  fan_out=False where the first
    # operator aggregates (map-side partial agg) or per-row work is
    # trivial — measured: the fan-out shuffle is pure cost there.
    return read_table(spark, sf_dir, name, fan_out=fan_out)


# ---------------------------------------------------------------------------
# MongoDB change-stream decode (SURVEY.md §2.3 D4–D7, §3 EP3)
# ---------------------------------------------------------------------------
#
# Envelope stream derived from `events`: insert/replace carry a fullDocument
# exercising $oid, $numberLong (→ string, pymongo Int64 semantics), $date
# (→ epoch-ms truncated to seconds), $numberInt and $numberDouble; deletes
# carry only documentKey; every 101st event is a `drop` (decoded to NULL op
# and filtered — reference `mongodb.py:337-343`).


def q_mongo_cdc_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 through BOTH implementations in ONE query: the Arrow
    Extended-JSON lattice (``decode_mongo_cdc``) and the compiled DIRECT
    typed-``from_json`` path (``compile_mongo_direct_decoder``), each row
    tagged with ``path`` — the oracle states the expected rows once per
    path, so a divergence in EITHER implementation hash-mismatches.
    (Collapsed from two registry entries so every entry fits the
    driver's per-round sweep.)"""
    from commons_codec_spark.functions.mongodb import compile_mongo_direct_decoder

    ev = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    cents = F.round(F.col("value") * 100).cast("long")
    oid = F.substring(F.md5(F.col("event_id").cast("string")), 1, 24)
    optype = (
        F.when(F.col("event_id") % 101 == 0, F.lit("drop"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .when(F.col("event_type") == "click", F.lit("replace"))
        .otherwise(F.lit("insert"))
    )
    full = F.format_string(
        '{"operationType":"%s","documentKey":{"_id":{"$oid":"%s"}},'
        '"fullDocument":{"event_id":{"$numberLong":"%d"},"event_type":"%s",'
        '"ts":{"$date":{"$numberLong":"%d"}},"user_id":{"$numberInt":"%d"},'
        '"value_cents":{"$numberDouble":"%d"}}}',
        optype, oid, F.col("event_id"), F.col("event_type"), ms,
        F.col("user_id"), cents,
    )
    keyed = F.format_string(
        '{"operationType":"%s","documentKey":{"_id":{"$oid":"%s"}}}', optype, oid
    )
    env = ev.select(
        F.when(optype.isin("insert", "replace"), full)
        .otherwise(keyed)
        .alias("event")
    )

    decoded = decode_mongo_cdc(env, "event").filter(F.col("op").isNotNull())
    rec = lambda p: F.get_json_object(F.col("record"), p)  # noqa: E731
    arrow = decoded.select(
        F.lit("arrow").alias("path"),
        "op",
        "oid",
        rec("$.event_id").cast("long").alias("event_id"),
        rec("$.event_type").alias("event_type"),
        rec("$.ts").cast("long").alias("ts_ms"),
        rec("$.user_id").cast("long").alias("user_id"),
        rec("$.value_cents").cast("double").cast("long").alias("value_cents"),
    )

    dec = compile_mongo_direct_decoder(
        env,
        "event",
        {
            "event_id": "long",
            "event_type": "string",
            "ts": "date",
            "user_id": "int",
            "value_cents": "double",
        },
    )
    jvm = dec.filter(F.col("op").isNotNull()).select(
        F.lit("jvm").alias("path"),
        "op",
        "oid",
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.col("ts").alias("ts_ms"),
        F.col("user_id").alias("user_id"),
        F.col("value_cents").cast("long").alias("value_cents"),
    )
    return arrow.unionAll(jvm)


_SQL_MONGO_CDC_SELECT = """
SELECT '{path}' AS path,
       CASE WHEN optype = 'replace' THEN 'update'
            WHEN optype = 'delete' THEN 'delete'
            ELSE 'insert' END AS op,
       oid,
       CASE WHEN optype <> 'delete' THEN event_id END AS event_id,
       CASE WHEN optype <> 'delete' THEN event_type END AS event_type,
       CASE WHEN optype <> 'delete' THEN ts_ms END AS ts_ms,
       CASE WHEN optype <> 'delete' THEN user_id END AS user_id,
       CASE WHEN optype <> 'delete' THEN cents END AS value_cents
FROM base WHERE optype <> 'drop'
"""

SQL_MONGO_CDC = (
    """
WITH base AS (
    SELECT event_id, user_id, event_type,
           epoch_ms(ts) // 1000 * 1000 AS ts_ms,
           CAST(round(value * 100) AS BIGINT) AS cents,
           substr(md5(CAST(event_id AS VARCHAR)), 1, 24) AS oid,
           CASE WHEN event_id % 101 = 0 THEN 'drop'
                WHEN event_type = 'error' THEN 'delete'
                WHEN event_type = 'click' THEN 'replace'
                ELSE 'insert' END AS optype
    FROM events
)
"""
    + _SQL_MONGO_CDC_SELECT.format(path="arrow")
    + " UNION ALL "
    + _SQL_MONGO_CDC_SELECT.format(path="jvm")
)


# ---------------------------------------------------------------------------
# Telemetry decoders (SURVEY.md §2.3 D10/D13)
# ---------------------------------------------------------------------------


def q_tts_ttn_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTS/TTN uplink decode (D13) through BOTH implementations in ONE
    query: payload merge + bw/freq/sf/counter derivation + per-gateway
    dynamic rssi columns + gtw_count, via the Arrow kernel
    (``decode_telemetry``) AND the pure-column-expression JVM twin
    (``decode_tts_ttn_jvm``), each row tagged with ``path`` — the oracle
    states the expected rows once per path, so a divergence in EITHER
    implementation hash-mismatches.  (Collapsed from two registry entries
    so every entry fits the driver's per-round sweep.)"""
    from commons_codec_spark.functions.telemetry import decode_tts_ttn_jvm

    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    payload = F.format_string(
        '{"end_device_ids":{"device_id":"dev-%d"},'
        '"uplink_message":{"decoded_payload":{"reading_cents":%d},'
        '"settings":{"data_rate":{"lora":{"bandwidth":125000,'
        '"spreading_factor":7}},"frequency":"868100000"},'
        '"f_cnt":%d,"rx_metadata":['
        '{"gateway_ids":{"gateway_id":"gw0"},"rssi":%d,"snr":5},'
        '{"gateway_ids":{"gateway_id":"gw1"},"rssi":%d,"snr":7}]}}',
        F.col("user_id"), cents, F.col("event_id") % 65536,
        -(F.col("user_id") % 60 + 30), -(F.col("user_id") % 60 + 35),
    )
    env = ev.select("event_id", payload.alias("payload"))
    cols = {
        "device_id": "string",
        "reading_cents": "long",
        "bw": "double",
        "sf": "long",
        "freq": "double",
        "counter": "long",
        "gtw_count": "long",
        "gw_gw0_rssi": "long",
        "gw_gw1_rssi": "long",
    }

    def pivot(decoded, tag):
        out = readings_to_columns(decoded, cols).drop("reading", "error")
        return out.select(F.lit(tag).alias("path"), *out.columns)

    return pivot(decode_telemetry(env, "tts_ttn", "payload"), "arrow").unionAll(
        pivot(decode_tts_ttn_jvm(env), "jvm")
    )


_SQL_TTS_TTN_ONE = """
SELECT '{path}' AS path,
       event_id,
       'dev-' || CAST(user_id AS VARCHAR) AS device_id,
       CAST(round(value * 100) AS BIGINT) AS reading_cents,
       CAST(125.0 AS DOUBLE) AS bw,
       CAST(7 AS BIGINT) AS sf,
       868100000 / 1000000.0 AS freq,
       CAST(event_id % 65536 AS BIGINT) AS counter,
       CAST(2 AS BIGINT) AS gtw_count,
       CAST(-(user_id % 60 + 30) AS BIGINT) AS gw_gw0_rssi,
       CAST(-(user_id % 60 + 35) AS BIGINT) AS gw_gw1_rssi
FROM events
"""

SQL_TTS_TTN = (
    _SQL_TTS_TTN_ONE.format(path="arrow")
    + " UNION ALL "
    + _SQL_TTS_TTN_ONE.format(path="jvm")
)


def q_tasmota_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tasmota sensor flatten (D10) through BOTH implementations in ONE
    query: the Arrow-kernel recursive flatten (``decode_telemetry``) and
    its bounded-recursion nested-``from_json`` JVM twin
    (``decode_tasmota_sensor_jvm``), each row tagged with ``path`` —
    the oracle states the expected rows once per path, so a divergence
    in EITHER implementation hash-mismatches.  (Collapsed from two
    registry entries so every entry fits the driver's per-round sweep.)
    """
    from commons_codec_spark.functions.telemetry import decode_tasmota_sensor_jvm

    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    payload = F.format_string(
        '{"Time":"%s","ANALOG":{"Temperature1":%d},'
        '"SML":{"m0":{"Type":"counter","Address":"0x1","Total_in":%d}},'
        '"TempUnit":"C"}',
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss"),
        F.col("user_id") % 40, cents,
    )
    env = ev.select("event_id", payload.alias("payload"))

    def pivot(decoded, tag):
        r = F.col("reading")
        return decoded.select(
            F.lit(tag).alias("path"),
            "event_id",
            F.translate(r["Time"], '"', "").alias("time_s"),
            r["ANALOG.Temperature1"].cast("long").alias("analog_temp"),
            r["SML.m0.Total_in"].cast("long").alias("sml_total"),
        )

    return pivot(decode_telemetry(env, "tasmota_sensor", "payload"), "arrow").unionAll(
        pivot(decode_tasmota_sensor_jvm(env, "payload"), "jvm")
    )


_SQL_TASMOTA_ONE = """
SELECT '{path}' AS path,
       event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%S') AS time_s,
       CAST(user_id % 40 AS BIGINT) AS analog_temp,
       CAST(round(value * 100) AS BIGINT) AS sml_total
FROM events
"""

SQL_TASMOTA = (
    _SQL_TASMOTA_ONE.format(path="arrow")
    + " UNION ALL "
    + _SQL_TASMOTA_ONE.format(path="jvm")
)


def q_sensor_community_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor.Community decode (D12) through BOTH implementations in ONE
    query: sensordatavalues[] explode + numeric coercion + integer
    whitelist + non-numeric passthrough via the Arrow kernel
    (``decode_telemetry``) AND the explode-free ``map_from_entries`` JVM
    twin (``decode_sensor_community_jvm``), each row tagged with ``path``
    — a divergence in EITHER implementation hash-mismatches.  (Collapsed
    from two registry entries so every entry fits the driver's per-round
    sweep.)"""
    from commons_codec_spark.functions.telemetry import decode_sensor_community_jvm

    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    payload = F.format_string(
        '{"sensordatavalues":[{"value_type":"P1","value":"%d"},'
        '{"value_type":"samples","value":"%d"},'
        '{"value_type":"note","value":"x%d"}]}',
        cents, F.col("user_id") % 50, F.col("user_id"),
    )
    env = ev.select("event_id", payload.alias("payload"))

    def pivot(decoded, tag):
        r = F.col("reading")
        return decoded.select(
            F.lit(tag).alias("path"),
            "event_id",
            r["P1"].cast("double").cast("long").alias("p1"),
            r["samples"].cast("long").alias("samples"),
            F.translate(r["note"], '"', "").alias("note"),
        )

    return pivot(
        decode_telemetry(env, "sensor_community", "payload"), "arrow"
    ).unionAll(pivot(decode_sensor_community_jvm(env, "payload"), "jvm"))


_SQL_SENSOR_COMMUNITY_ONE = """
SELECT '{path}' AS path,
       event_id,
       CAST(round(value * 100) AS BIGINT) AS p1,
       CAST(user_id % 50 AS BIGINT) AS samples,
       'x' || CAST(user_id AS VARCHAR) AS note
FROM events
"""

SQL_SENSOR_COMMUNITY = (
    _SQL_SENSOR_COMMUNITY_ONE.format(path="arrow")
    + " UNION ALL "
    + _SQL_SENSOR_COMMUNITY_ONE.format(path="jvm")
)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN + embedding near-dup (scale paths for similarity search)
# ---------------------------------------------------------------------------
#
# The random-hyperplane signs are md5-derived constants (operators/
# similarity.py:96-113); the oracle bakes the identical signs in as SQL
# literals computed here with hashlib.


def _sql_signs(h: int, dim: int = 64) -> str:
    signs = [
        1 if hashlib.md5(f"{h}:{j}".encode()).hexdigest()[0] in "89abcdef" else -1
        for j in range(dim)
    ]
    return "[" + ",".join(str(s) for s in signs) + "]"


def _sql_bucket(n_bits: int, dim: int = 64) -> str:
    terms = []
    for h in range(n_bits):
        proj = (
            f"list_aggregate(list_transform(range(1, {dim + 1}), "
            f"i -> qv[i] * ({_sql_signs(h, dim)})[i]), 'sum')"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << h} ELSE 0 END)")
    return " + ".join(terms)


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    embs = _t(spark, sf_dir, "embeddings")
    probes = embs.filter(F.col("vec_id") % 100 == 0)
    return similarity.lsh_topk(embs, probes, dim=64, k=5, n_bits=6)


SQL_LSH_TOPK = f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
    FROM embeddings
),
n AS (
    SELECT vec_id, qv,
           list_aggregate(list_transform(qv, x -> x * x), 'sum') AS n2,
           {_sql_bucket(6)} AS bucket
    FROM q
),
pairs AS (
    SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
           list_aggregate(list_transform(range(1, 65),
               i -> p.qv[i] * c.qv[i]), 'sum') AS dot,
           p.n2 AS p2, c.n2 AS n2
    FROM n p JOIN n c ON p.bucket = c.bucket
    WHERE p.vec_id % 100 = 0 AND p.vec_id <> c.vec_id
),
scored AS (
    SELECT probe_id, neighbor_id,
           CAST(CASE WHEN dot < 0 THEN -1 ELSE 1 END *
                FLOOR(CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) * 10000.0 /
                      greatest(CAST(p2 AS DOUBLE) * CAST(n2 AS DOUBLE), 1.0))
                AS BIGINT) AS cos2_bp
    FROM pairs
)
SELECT probe_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY probe_id
            ORDER BY cos2_bp DESC, neighbor_id ASC) AS INT) AS rank,
       cos2_bp
FROM scored
QUALIFY rank <= 5
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    embs = _t(spark, sf_dir, "embeddings")
    probes = embs.filter(F.col("vec_id") % 100 == 0)
    return similarity.ivf_topk(
        embs, probes, dim=64, k=5, centroid_mod=50, nprobe=2
    )


_SQL_Q_QUANT = """
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
    FROM embeddings
"""

SQL_IVF_TOPK = f"""
WITH q AS ({_SQL_Q_QUANT}),
c AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id % 50 = 0),
dists AS (
    SELECT q.vec_id, c.cid,
           list_aggregate(list_transform(range(1, 65),
               i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])), 'sum') AS d
    FROM q, c
),
ranked AS (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM dists
),
cell AS (
    SELECT q.vec_id AS neighbor_id, r.cid AS cell, q.qv,
           list_aggregate(list_transform(q.qv, x -> x * x), 'sum') AS n2
    FROM q JOIN ranked r ON r.vec_id = q.vec_id AND r.rn = 1
),
pcell AS (
    SELECT q.vec_id AS probe_id, r.cid AS cell, q.qv AS pv,
           list_aggregate(list_transform(q.qv, x -> x * x), 'sum') AS p2
    FROM q JOIN ranked r ON r.vec_id = q.vec_id AND r.rn <= 2
    WHERE q.vec_id % 100 = 0
),
pairs AS (
    SELECT p.probe_id, c.neighbor_id,
           list_aggregate(list_transform(range(1, 65),
               i -> p.pv[i] * c.qv[i]), 'sum') AS dot,
           p.p2, c.n2
    FROM pcell p JOIN cell c ON p.cell = c.cell
    WHERE p.probe_id <> c.neighbor_id
),
scored AS (
    SELECT probe_id, neighbor_id,
           CAST(CASE WHEN dot < 0 THEN -1 ELSE 1 END *
                FLOOR(CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) * 10000.0 /
                      greatest(CAST(p2 AS DOUBLE) * CAST(n2 AS DOUBLE), 1.0))
                AS BIGINT) AS cos2_bp
    FROM pairs
)
SELECT probe_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY probe_id
            ORDER BY cos2_bp DESC, neighbor_id ASC) AS INT) AS rank,
       cos2_bp
FROM scored
QUALIFY rank <= 5
"""


def _augmented_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings (as double) + near-copies (id%20==0, +1M, scaled ×1.02 —
    cosine ≈ 1 modulo quantization)."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select("vec_id", as_double.alias("embedding"))
    near = e.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: x.cast("double") * 1.02
        ).alias("embedding"),
    )
    return base.unionAll(near)


_SQL_AUG_EMB = """
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
    FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.02) AS embedding
    FROM embeddings WHERE vec_id % 20 = 0
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _augmented_embeddings(spark, sf_dir)
    return similarity.cosine_near_dup_pairs(
        aug, threshold_bp=9000, n_bits=4, dim=64
    )


SQL_EMB_NEAR_DUP = f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(x * 1000) AS BIGINT)) AS qv
    FROM ({_SQL_AUG_EMB})
),
n AS (
    SELECT vec_id, qv,
           list_aggregate(list_transform(qv, x -> x * x), 'sum') AS n2,
           {_sql_bucket(4)} AS bucket
    FROM q
),
cand AS (
    SELECT l.vec_id AS a, r.vec_id AS b,
           list_aggregate(list_transform(range(1, 65),
               i -> l.qv[i] * r.qv[i]), 'sum') AS dot,
           l.n2 AS na, r.n2 AS nb
    FROM n l JOIN n r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
),
scored AS (
    SELECT a, b,
           CAST(CASE WHEN dot < 0 THEN -1 ELSE 1 END *
                FLOOR(CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) * 10000.0 /
                      greatest(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE), 1.0))
                AS BIGINT) AS cos2_bp
    FROM cand
)
SELECT a, b, cos2_bp FROM scored WHERE cos2_bp >= 9000
"""


# ---------------------------------------------------------------------------
# DMS control plane: op normalization, awsdms_* routing, type resolution
# (SURVEY.md §2.2 P3/P5, §2.3 D9, §2.4 E9)
# ---------------------------------------------------------------------------

def q_dms_envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw DMS envelope decode (EP1): one from_json for metadata + plain-JSON
    data, op normalization, awsdms_* routing — all JVM-side."""
    from commons_codec_spark.functions.dms import make_dms_decoder

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("long")
    op = (
        F.when(k % 10 == 0, F.lit("load"))
        .when(k % 10 < 7, F.lit("insert"))
        .when(k % 10 < 9, F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    table = F.when(k % 97 == 0, F.lit("awsdms_history")).otherwise(F.lit("orders_cdc"))
    envelope = F.format_string(
        '{"data":{"okey":%d,"status":"%s","total_cents":%d},'
        '"metadata":{"operation":"%s","schema-name":"sales","table-name":"%s"}}',
        k, F.col("o_orderstatus"), F.round(F.col("o_totalprice") * 100).cast("long"),
        op, table,
    )
    env = o.select(envelope.alias("envelope"), k.alias("seq"))
    decode = make_dms_decoder(
        {"okey": "bigint", "status": "string", "total_cents": "bigint"},
        keys=["okey"],
    )
    return decode(env)


SQL_DMS_ENVELOPE = """
WITH base AS (
    SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderstatus AS status,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
)
SELECT k AS seq,
       CASE WHEN k % 10 = 0 THEN 'insert'
            WHEN k % 10 < 7 THEN 'insert'
            WHEN k % 10 < 9 THEN 'update'
            ELSE 'delete' END AS op,
       CASE WHEN k % 97 = 0 THEN 'dms' ELSE 'sales' END AS schema_routed,
       CASE WHEN k % 97 = 0 THEN 'awsdms_history' ELSE 'orders_cdc' END AS table_routed,
       k AS okey,
       status,
       cents AS total_cents
FROM base
"""


_DMS_OPS = ["load", "insert", "update", "delete", "create-table", "drop-table", "bogus"]
_DMS_TYPES = ["INT8", "INT16", "INT32", "INT64", "STRING", "NUMERIC", "CLOB"]


def q_dms_control_plane(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier", fan_out=False)  # 1k rows, trivial ops
    k = F.col("s_suppkey").cast("long")
    idx = (k % 7 + 1).cast("int")
    table = (
        F.when(k % 5 == 0, F.lit("awsdms_apply_exceptions"))
        .otherwise(F.concat(F.lit("t_"), k))
    )
    env = s.select(
        k.alias("suppkey"),
        F.element_at(F.array(*[F.lit(o) for o in _DMS_OPS]), idx).alias("operation"),
        F.lit("crm").alias("schema_name"),
        table.alias("table_name"),
        F.element_at(F.array(*[F.lit(t) for t in _DMS_TYPES]), idx).alias("dms_type"),
    )
    return env.select(
        "suppkey",
        "table_name",
        dms.route_schema(F.col("schema_name"), F.col("table_name")).alias("schema_routed"),
        dms.normalize_op(F.col("operation")).alias("op_norm"),
        dms.resolve_type_col(F.col("dms_type")).alias("sink_type"),
    )


SQL_DMS_CONTROL = """
WITH base AS (
    SELECT s_suppkey AS suppkey,
           CASE WHEN s_suppkey % 5 = 0 THEN 'awsdms_apply_exceptions'
                ELSE 't_' || CAST(s_suppkey AS VARCHAR) END AS table_name,
           s_suppkey % 7 AS i
    FROM supplier
)
SELECT suppkey,
       table_name,
       CASE WHEN table_name LIKE 'awsdms_%' THEN 'dms' ELSE 'crm' END AS schema_routed,
       CASE i WHEN 0 THEN 'insert' WHEN 1 THEN 'insert' WHEN 2 THEN 'update'
              WHEN 3 THEN 'delete' WHEN 4 THEN 'control' WHEN 5 THEN 'control'
              ELSE NULL END AS op_norm,
       CASE i WHEN 0 THEN 'INT1' WHEN 1 THEN 'INT2' WHEN 2 THEN 'INT4'
              WHEN 3 THEN 'INT8' ELSE 'TEXT' END AS sink_type
FROM base
"""


# ---------------------------------------------------------------------------
# Gap-based sessionization (batch twin of the streaming session_window)
# ---------------------------------------------------------------------------


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from commons_codec_spark.operators import sessions

    # window+agg-first: fan-out measured 0.81s -> 1.40s (pure cost)
    ev = _t(spark, sf_dir, "events", fan_out=False)
    out = sessions.session_stats(
        ev, ["user_id"], ts_col="ts", gap_sec=600, tiebreak_col="event_id"
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "session_id",
        "n_events",
        "start_us",
        "end_us",
        "duration_us",
    )


SQL_SESSIONIZATION = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
m AS (
    SELECT user_id, ts_us, event_id,
           CASE WHEN lag(ts_us) OVER w IS NULL
                  OR ts_us - lag(ts_us) OVER w > 600000000 THEN 1
                ELSE 0 END AS ns
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
s AS (
    SELECT user_id, ts_us,
           SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS UNBOUNDED PRECEDING) - 1 AS session_id
    FROM m
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts_us) AS start_us,
       MAX(ts_us) AS end_us,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM s GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (training-pipeline text analysis)
# ---------------------------------------------------------------------------


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one row per (doc, fingerprint): the driver's canonicalizer sorts the
    # result in pandas, which cannot hash array cells — scalars only
    d = _t(spark, sf_dir, "documents")
    fps = d.select(
        "doc_id",
        text.rolling_fingerprints(F.col("text"), k=5, window=4).alias("fps"),
    )
    return fps.select("doc_id", F.explode("fps").alias("fingerprint"))


_SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

SQL_ROLLING_FP = f"""
WITH g AS (SELECT doc_id, {_SQL_NORM} AS t FROM documents),
h AS (
    SELECT doc_id,
           CASE WHEN len(t) - 4 < 1 THEN []
                ELSE list_transform(range(1, len(t) - 4 + 1),
                                    i -> md5(substr(t, i, 5))) END AS hs
    FROM g
),
fp AS (
    SELECT doc_id,
           list_sort(list_distinct(
               CASE WHEN len(hs) - 3 < 1 THEN []
                    ELSE list_transform(range(1, len(hs) - 3 + 1),
                                        i -> list_aggregate(hs[i:i+3], 'min')) END
           )) AS fingerprints
    FROM h
)
SELECT doc_id, unnest(fingerprints) AS fingerprint FROM fp
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing (decode stubbed; schema/partitioning/batching real).
# The stand-in codecs are stated over sha256/md5 so DuckDB oracles verify
# them hash-exact: features are sha256 bytes mapped to (b/256 - 0.5)
# (exact in float32 — power-of-two divisor), frames are sha256 over
# "md5hex(payload):ts".
# ---------------------------------------------------------------------------


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sha256 stub codec is ~2us/row: single-task scan beats 32 Python
    # worker handshakes at this corpus size (measured 0.41s vs 0.52s)
    d = _t(spark, sf_dir, "documents", fan_out=False)
    media = d.select("doc_id", F.col("text").cast("binary").alias("media"))
    feats = multimodal.extract_features(media, dim=8, media_col="media")
    # scalar rows for the driver canonicalizer; ×1024 is exact on the
    # float32 components (= byte*4 - 512), so the hash compare is stable
    exploded = feats.select("doc_id", F.posexplode("features").alias("j", "f"))
    return exploded.select(
        "doc_id",
        F.col("j").cast("long").alias("j"),
        (F.col("f") * 1024).cast("long").alias("feat_q"),
    )


_SQL_HEX_DIGITS = "0123456789abcdef"

SQL_MULTIMODAL_FEATURES = f"""
WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents),
j AS (SELECT doc_id, hx, unnest(range(0, 8)) AS j FROM h)
SELECT doc_id, j,
       CAST(((strpos('{_SQL_HEX_DIGITS}', substr(hx, CAST(2*j+1 AS INT), 1)) - 1) * 16
            + (strpos('{_SQL_HEX_DIGITS}', substr(hx, CAST(2*j+2 AS INT), 1)) - 1)) * 4 - 512
            AS BIGINT) AS feat_q
FROM j
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", fan_out=False)  # see q_multimodal_features
    media = d.select("doc_id", F.col("text").cast("binary").alias("media"))
    resized = multimodal.resize_images(media, width=64, height=48)
    return resized.select(
        "doc_id", "resized_w", "resized_h",
        F.length(F.col("media")).alias("payload_len"),
    )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", fan_out=False)  # see q_multimodal_features
    media = d.select(
        "doc_id",
        F.col("text").cast("binary").alias("media"),
        F.create_map(
            F.lit("duration_ms"), (F.col("n_chars") % 5 + 1) * 1000
        ).alias("media_meta"),
    )
    frames = multimodal.sample_frames(media, every_ms=1000)
    return frames.select(
        "doc_id", "frame_ts_ms", F.lower(F.hex(F.col("frame"))).alias("frame_hex")
    )


SQL_MULTIMODAL_FRAMES = """
WITH f AS (
    SELECT doc_id, text,
           unnest(range(0, (n_chars % 5 + 1) * 1000, 1000)) AS frame_ts_ms
    FROM documents
)
SELECT doc_id, frame_ts_ms,
       sha256(md5(text) || ':' || CAST(frame_ts_ms AS VARCHAR)) AS frame_hex
FROM f
"""


EXTRA_QUERIES = {
    # both decode paths (Arrow Extended-JSON lattice + compiled DIRECT
    # from_json) verified inside the ONE entry — see q_mongo_cdc_decode
    "mongo_cdc_decode": (q_mongo_cdc_decode, SQL_MONGO_CDC),
    # telemetry twins (Arrow kernel + JVM expression path) are each
    # verified inside ONE both-path entry — see the q_* docstrings
    "telemetry_tts_ttn": (q_tts_ttn_decode, SQL_TTS_TTN),
    "telemetry_tasmota": (q_tasmota_decode, SQL_TASMOTA),
    "telemetry_sensor_community": (q_sensor_community_decode, SQL_SENSOR_COMMUNITY),
    "similarity_lsh_topk": (q_lsh_topk, SQL_LSH_TOPK),
    "similarity_ivf_topk": (q_ivf_topk, SQL_IVF_TOPK),
    "embedding_near_dup": (q_embedding_near_dup, SQL_EMB_NEAR_DUP),
    "sessionization_stats": (q_sessionization, SQL_SESSIONIZATION),
    "dms_control_plane": (q_dms_control_plane, SQL_DMS_CONTROL),
    "dms_envelope_decode": (q_dms_envelope_decode, SQL_DMS_ENVELOPE),
    "text_rolling_fingerprint": (q_rolling_fingerprint, SQL_ROLLING_FP),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
    "multimodal_resize": (
        q_multimodal_resize,
        # the shape/accounting side is SQL-stateable even though the codec
        # is stubbed: fixed target dims, payload_len = max(w*h/64, 32)
        "SELECT doc_id, CAST(64 AS INT) AS resized_w, CAST(48 AS INT) AS resized_h, "
        "CAST(48 AS INT) AS payload_len FROM documents",
    ),
    "multimodal_frame_sample": (q_multimodal_frames, SQL_MULTIMODAL_FRAMES),
}

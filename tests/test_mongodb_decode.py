"""MongoDB Extended JSON lattice goldens (D4–D7).

Expectations mirror the reference's canonical all-types pairs
(`/root/reference/tests/transform/mongodb/data.py:15-224`) and converter
flag matrix (`tests/transform/mongodb/test_mongodb_convert.py:23-45`),
restricted to JSON-representable inputs (change streams deliver JSON; the
live-BSON cases need pymongo, absent here by design).
"""

import datetime as dt
import json

import pytest

from commons_codec_spark.functions import mongodb as mdb


def test_oid_and_scalars():
    assert mdb.decode_value({"$oid": "56027fcae4b09385a85f9344"}) == "56027fcae4b09385a85f9344"
    assert mdb.decode_value({"$numberInt": "-2147483648"}) == -2147483648
    assert mdb.decode_value({"$numberDouble": "-1.2345678921232E+18"}) == -1.2345678921232e18
    # canonical int64 stringifies (bson.Int64 -> str in the reference)
    assert mdb.decode_value({"$numberLong": "-9223372036854775808"}) == "-9223372036854775808"


def test_decimal128_variants():
    assert mdb.decode_value({"$numberDecimal": "42.42"}) == "42.42"
    assert mdb.decode_value({"$numberDecimal": "NaN"}) == "NaN"
    assert mdb.decode_value({"$numberDecimal": "Infinity"}) == "Infinity"


def test_dates_epoch_ms():
    assert mdb.decode_value({"$date": "2015-09-23T10:32:42.33Z"}) == 1443004362000
    assert mdb.decode_value({"$date": {"$numberLong": "1356351330000"}}) == 1356351330000
    # out-of-range epoch -> 0 (InvalidBSON fallback)
    assert mdb.decode_value({"$date": {"$numberLong": "-9223372036854775808"}}) == 0
    assert mdb.decode_value({"$timestamp": {"t": 123456789, "i": 42}}) == 123456789000


def test_date_modes():
    iso = mdb.MongoDecodeConfig(timestamp_to_epoch=False, timestamp_to_iso8601=True)
    assert mdb.decode_value({"$date": "2015-09-23T10:32:42.33Z"}, iso) == (
        "2015-09-23T10:32:42.330000+00:00"
    )
    secs = mdb.MongoDecodeConfig(timestamp_use_milliseconds=False)
    assert mdb.decode_value({"$date": {"$numberLong": "1356351330000"}}, secs) == 1356351330


def test_binary_subtypes():
    uuid_in = {"$binary": {"base64": "c//SZESzTGmQ6OfR38A11A==", "subType": "04"}}
    assert mdb.decode_value(uuid_in) == "73ffd264-44b3-4c69-90e8-e7d1dfc035d4"
    # non-UUID subtypes re-encode (base64 normalization, cf. golden 3B== -> 3A==)
    other = {"$binary": {"base64": "c//AYDC420csII3929483B==", "subType": "80"}}
    assert mdb.decode_value(other) == "c//AYDC420csII3929483A=="


def test_special_markers():
    assert mdb.decode_value({"$maxKey": 1}) == "MaxKey()"
    assert mdb.decode_value({"$minKey": 1}) == "MinKey()"
    assert mdb.decode_value({"$symbol": "foo"}) == "foo"
    assert mdb.decode_value({"$undefined": True}) is None
    assert mdb.decode_value({"$regularExpression": {"pattern": ".*", "options": ""}}) == "Regex('.*', 0)"
    assert mdb.decode_value({"$code": "abab"}) == "abab"


def test_multikey_dollar_dicts_recurse():
    assert mdb.decode_value(
        {"$code": "abab", "$scope": {"x": {"$numberInt": "42"}}}
    ) == {"$code": "abab", "$scope": {"x": 42}}
    assert mdb.decode_value(
        {"$id": {"$oid": "56027fcae4b09385a85f9344"}, "$ref": "foo", "$db": "bar"}
    ) == {"$id": "56027fcae4b09385a85f9344", "$ref": "foo", "$db": "bar"}
    assert mdb.decode_value({"$a": "foo"}) == {"$a": "foo"}


def test_nested_lists_and_python_types():
    assert mdb.decode_value(
        [{"$date": "2015-09-24T10:32:42.33Z"}, {"$date": {"$numberLong": "2147483647000"}}]
    ) == [1443090762000, 2147483647000]
    assert mdb.decode_value({1, 3, 2}) == [1, 2, 3]
    assert mdb.decode_value((1, 2)) == [1, 2]
    assert mdb.decode_value(dt.datetime(2024, 7, 16, 14, 29, 22, 907000)) == 1721140162000


def test_convert_epoch_and_iso8601():
    assert mdb.convert_epoch(1721140162) == 1721140162
    assert mdb.convert_epoch(dt.datetime(2024, 7, 16, 14, 29, 22)) == 1721140162
    assert mdb.convert_epoch("2024-07-16T14:29:22Z") == 1721140162
    assert mdb.convert_iso8601("x") == "x"
    assert mdb.convert_iso8601(1721140162) == "2024-07-16T14:29:22+00:00"
    with pytest.raises(ValueError):
        mdb.convert_epoch(4.5)


def test_cdc_event_dispatch():
    ins = mdb.decode_cdc_event(
        {
            "operationType": "insert",
            "documentKey": {"_id": {"$oid": "669683c2b0750b2c84893f3e"}},
            "fullDocument": {"_id": {"$oid": "669683c2b0750b2c84893f3e"}, "t": 42.42},
        }
    )
    assert ins == {
        "op": "insert",
        "oid": "669683c2b0750b2c84893f3e",
        "record": {"_id": "669683c2b0750b2c84893f3e", "t": 42.42},
    }
    assert mdb.decode_cdc_event({"operationType": "drop"}) is None
    assert mdb.decode_cdc_event({"operationType": "invalidate"}) is None
    delete = mdb.decode_cdc_event(
        {"operationType": "delete", "documentKey": {"_id": {"$oid": "aa"}}}
    )
    assert delete == {"op": "delete", "oid": "aa", "record": None}
    with pytest.raises(ValueError, match="missing or empty"):
        mdb.decode_cdc_event({})
    with pytest.raises(ValueError, match="Unknown CDC operation"):
        mdb.decode_cdc_event({"operationType": "bogus"})


def test_vectorized_mongo_decode(spark):
    rows = [
        (json.dumps({"operationType": "insert",
                     "documentKey": {"_id": {"$oid": "a1"}},
                     "fullDocument": {"_id": {"$oid": "a1"}, "x": {"$numberInt": "7"}}}),),
        (json.dumps({"operationType": "drop"}),),
        ('{"broken',),
    ]
    df = spark.createDataFrame(rows, "event string")
    out = mdb.decode_mongo_cdc(df).collect()
    assert out[0].op == "insert" and json.loads(out[0].record) == {"_id": "a1", "x": 7}
    assert out[1].op is None and out[1].error is None  # skipped drop
    assert out[2].error is not None  # poison -> DLQ


def test_native_bson_duck_typed_decode():
    """D4 native-object path: bson classes duck-typed by name (pymongo not
    installed here — stand-ins share the class names and attributes the
    dispatch reads; a live pymongo cursor hits the same branches).
    Expectations mirror reference `decode_bson` goldens
    (`tests/transform/mongodb/data.py`, the `bson` section)."""
    import decimal
    import uuid as _uuid

    class ObjectId:
        def __str__(self):
            return "56027fcae4b09385a85f9344"

    class Int64(int):
        pass

    class Decimal128:
        def __str__(self):
            return "-1.2345678921232E+18"

    class Timestamp:
        time = 1455141155

    class Binary(bytes):
        subtype = 0

    class MinKey:
        pass

    class MaxKey:
        pass

    class Regex:
        pattern, flags = "^foo", 2

    doc = {
        "_id": ObjectId(),
        "big": Int64(42),
        "dec": Decimal128(),
        "ts": Timestamp(),
        "bin": Binary(b"bar"),
        "raw": b"baz",
        "uid": _uuid.UUID("d575540f-759d-4653-a5c7-4f9f704861d5"),
        "lo": MinKey(),
        "hi": MaxKey(),
        "re": Regex(),
        "py_dec": decimal.Decimal("42.42"),
    }
    out = mdb.decode_document(doc)
    assert out == {
        "_id": "56027fcae4b09385a85f9344",
        "big": "42",
        "dec": "-1.2345678921232E+18",
        "ts": 1455141155000,
        "bin": "YmFy",
        "raw": "YmF6",
        "uid": "d575540f-759d-4653-a5c7-4f9f704861d5",
        "lo": "MinKey()",
        "hi": "MaxKey()",
        "re": "Regex('^foo', 2)",
        "py_dec": "42.42",
    }


def test_native_binary_subtype4_is_uuid():
    class Binary(bytes):
        subtype = 4

    raw = b"\xd5u T\x0fu\x9dFS\xa5\xc7O\x9fpHa"
    # 16 bytes -> canonical UUID string
    out = mdb.decode_value(Binary(b"\xd5\x75\x54\x0f\x75\x9d\x46\x53\xa5\xc7\x4f\x9f\x70\x48\x61\xd5"))
    assert out == "d575540f-759d-4653-a5c7-4f9f704861d5"


def test_compile_mongo_direct_matches_lattice(spark):
    """EP3 DIRECT path vs the Arrow lattice over the same envelopes:
    insert/replace/delete/drop/poison, canonical wrappers incl. $date."""
    import json as _json

    import pyspark.sql.functions as F

    from commons_codec_spark.functions.mongodb import (
        compile_mongo_direct_decoder,
        decode_mongo_cdc,
    )

    def env(op, oid, doc=None):
        e = {"operationType": op, "documentKey": {"_id": {"$oid": oid}}}
        if doc is not None:
            e["fullDocument"] = doc
        return _json.dumps(e)

    doc = {
        "event_id": {"$numberLong": "7"},
        "event_type": "click",
        "ts": {"$date": {"$numberLong": "1717243200123"}},
        "user_id": {"$numberInt": "42"},
        "value_cents": {"$numberDouble": "199"},
    }
    rows = [
        (env("insert", "a" * 24, doc),),
        (env("replace", "b" * 24, doc),),
        (env("delete", "c" * 24),),
        (env("drop", "d" * 24),),
        ('{"documentKey": {}}',),  # missing operationType -> poison
        ("{nope",),
    ]
    df = spark.createDataFrame(rows, "event string")
    cols = {
        "event_id": "long",
        "event_type": "string",
        "ts": "date",
        "user_id": "int",
        "value_cents": "double",
    }
    direct = compile_mongo_direct_decoder(df, "event", cols).collect()
    lattice = decode_mongo_cdc(df, "event").collect()
    assert len(direct) == len(lattice)
    for d, l in zip(direct, lattice):
        assert d["op"] == l["op"]
        assert (d["error"] is None) == (l["error"] is None)
        if l["op"] in ("insert", "update") and l["record"]:
            rec = _json.loads(l["record"])
            assert d["oid"] == l["oid"]
            assert str(d["event_id"]) == str(rec["event_id"])
            assert d["event_type"] == rec["event_type"]
            assert d["ts"] == rec["ts"]  # epoch-ms, second-truncated
            assert d["user_id"] == rec["user_id"]
            assert d["value_cents"] == rec["value_cents"]

    plan = (
        compile_mongo_direct_decoder(df, "event", cols)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_compile_mongo_direct_rejects_unknown_type(spark):
    import pytest

    from commons_codec_spark.functions.mongodb import compile_mongo_direct_decoder

    df = spark.createDataFrame([("{}",)], "event string")
    with pytest.raises(ValueError, match="unsupported DIRECT column types"):
        compile_mongo_direct_decoder(df, "event", {"x": "complex"})


def test_direct_decoder_malformed_numbers_total(spark):
    """ADVICE r2: malformed $number* payloads must decode NULL under ANSI
    mode (try_cast), not throw CAST_INVALID_INPUT and kill the batch."""
    from commons_codec_spark.functions.mongodb import compile_mongo_direct_decoder

    good = (
        '{"operationType":"insert","documentKey":{"_id":{"$oid":"a"*1}},'
        '"fullDocument":{"n":{"$numberInt":"7"},"d":{"$numberDouble":"1.5"},'
        '"when":{"$date":{"$numberLong":"1000"}}}}'
    ).replace('"a"*1', '"aaaaaaaaaaaaaaaaaaaaaaaa"')
    bad = (
        '{"operationType":"insert","documentKey":{"_id":{"$oid":"b"*1}},'
        '"fullDocument":{"n":{"$numberInt":"zz"},"d":{"$numberDouble":"x"},'
        '"when":{"$date":{"$numberLong":"nope"}}}}'
    ).replace('"b"*1', '"bbbbbbbbbbbbbbbbbbbbbbbb"')
    df = spark.createDataFrame([(1, good), (2, bad)], "id long, event string")
    cols = {"n": "int", "d": "double", "when": "date"}
    out = {r["id"]: r for r in compile_mongo_direct_decoder(df, "event", cols).collect()}
    assert out[1]["n"] == 7 and out[1]["d"] == 1.5
    assert out[2]["op"] == "insert" and out[2]["error"] is None
    assert out[2]["n"] is None and out[2]["d"] is None and out[2]["when"] is None

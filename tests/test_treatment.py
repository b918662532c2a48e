"""Treatment-op parity with the reference's Tikray usage.

Goldens mirror /root/reference/tests/transform/mongodb/
test_mongodb_convert.py:158-302 (ignore_complex_lists,
normalize_complex_lists, all-options) — semantics only, independently
expressed.
"""

import pyspark.sql.functions as F

from commons_codec_spark.functions import treatment as tr
from commons_codec_spark.functions.mongodb import MongoDecodeConfig, decode_document

DOC_COMPLEX = {
    "_id": {"$oid": "56027fcae4b09385a85f9344"},
    "value": {
        "id": 42,
        "date": {"$date": "2015-09-23T10:32:42.33Z"},
        "some_complex_list": [
            {"id": "foo", "value": "something"},
            {"id": "bar", "value": {"$date": "2015-09-24T10:32:42.33Z"}},
        ],
    },
}


def test_treatment_ignore_complex_lists():
    cfg = MongoDecodeConfig(treatment=tr.Treatment(ignore_complex_lists=True))
    assert decode_document(DOC_COMPLEX, cfg) == {
        "_id": "56027fcae4b09385a85f9344",
        "value": {"id": 42, "date": 1443004362000},
    }


def test_treatment_normalize_complex_lists():
    cfg = MongoDecodeConfig(treatment=tr.Treatment(normalize_complex_lists=True))
    out = decode_document(DOC_COMPLEX, cfg)
    # inner dict values stringify RAW (pre-decode) — reference parity
    assert out["value"]["some_complex_list"] == [
        {"id": "foo", "value": "something"},
        {"id": "bar", "value": "{'$date': '2015-09-24T10:32:42.33Z'}"},
    ]


def test_treatment_all_options():
    doc = {
        "_id": {"$oid": "56027fcae4b09385a85f9344"},
        "ignore_toplevel": 42,
        "value": {
            "id": 42,
            "date": {"$date": "2015-09-23T10:32:42.33Z"},
            "ignore_nested": 42,
        },
        "to_list": 42,
        "to_string": 42,
        "to_dict_scalar": 42,
        "to_dict_list": [{"user": 42}],
    }
    cfg = MongoDecodeConfig(
        treatment=tr.Treatment(
            ignore_field=["ignore_toplevel", "ignore_nested"],
            convert_list=["to_list"],
            convert_string=["to_string"],
            convert_dict=[
                {"name": "to_dict_scalar", "wrapper_name": "id"},
                {"name": "user", "wrapper_name": "id"},
            ],
        )
    )
    assert decode_document(doc, cfg) == {
        "_id": "56027fcae4b09385a85f9344",
        "value": {"date": 1443004362000, "id": 42},
        "to_list": [42],
        "to_string": "42",
        "to_dict_scalar": {"id": 42},
        "to_dict_list": [{"user": {"id": 42}}],
    }


def test_column_treatments_compose(spark):
    df = spark.createDataFrame(
        [(1, 7, [[1, 2], [3]], "x")], "k long, v long, nested array<array<long>>, junk string"
    )
    hook = tr.chain(
        tr.ignore_fields("junk", "not_there"),
        tr.convert_string("v"),
        tr.flatten("nested"),
        tr.convert_list("k"),
    )
    row = hook(df).collect()[0]
    assert row.asDict() == {"k": [1], "v": "7", "nested": [1, 2, 3]}

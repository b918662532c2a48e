"""JVM universal decoder vs the Arrow kernel (the specification).

The Arrow kernel (`decode_universal`) is the executable spec of the
reference's recursive descriptor decode
(``/root/reference/src/commons_codec/vendor/boto3/dynamodb/types.py:82-144``
+ CrateDB overrides).  These tests pin the JVM expression decoder
(`decode_universal_jvm`) to it: bucket-for-bucket equality on goldens, a
seeded random descriptor corpus, depth-wall fallback, and plan hygiene
(no Python eval nodes when fallback is off).
"""

from __future__ import annotations

import json
import random

import pytest

from commons_codec_spark.functions.dynamodb import decode_universal
from commons_codec_spark.functions.dynamodb_jvm import decode_universal_jvm


def _cross_check(spark, rows, max_depth=4, fallback=True):
    df = spark.createDataFrame(rows, "op string, keys_json string, image string")
    key = lambda r: (r["keys_json"] or "", r["image"] or "")  # noqa: E731
    py = sorted(decode_universal(df).collect(), key=key)
    jv = sorted(
        decode_universal_jvm(df, max_depth=max_depth, fallback=fallback).collect(),
        key=key,
    )
    assert len(py) == len(jv)
    for p, j in zip(py, jv):
        for bucket in ("pk", "typed", "untyped"):
            assert p[bucket] == j[bucket], (
                f"{bucket} diverged for image={p['image']!r}:\n"
                f"  arrow: {p[bucket]}\n  jvm:   {j[bucket]}"
            )
        # error text differs (Python exception vs generic JVM marker);
        # nullness must agree
        assert (p["error"] is None) == (j["error"] is None), (
            p["error"],
            j["error"],
        )


def _k(i):
    return json.dumps({"id": {"S": f"k{i}"}})


def test_golden_images_cross_check(spark):
    _cross_check(
        spark,
        [
            (
                "insert",
                _k(1),
                json.dumps(
                    {
                        "id": {"S": "k1"},
                        "n": {"N": "84.84"},
                        "ni": {"N": "42"},
                        "m": {"M": {"t": {"N": "1.5"}, "s": {"S": "x"}}},
                        "mm": {"M": {"in": {"M": {"deep": {"S": "y"}}}}},
                        "ss": {"SS": ["foo", "bar"]},
                        "ns": {"NS": [1, 2, 3, 0.34]},
                        "bs": {"BS": ["b", "a"]},
                        "hl": {"L": [{"S": "foo"}, {"S": "bar"}]},
                        "vl": {
                            "L": [{"M": {"a": {"N": 1}}}, {"N": 2}, {"S": "T"}]
                        },
                        "bt": {"BOOL": True},
                        "bf": {"BOOL": False},
                        "nul": {"NULL": True},
                        "bin": {"B": "U3Vubnk="},
                        "uni": {"S": 'héllo "q" \\ \n\ttab'},
                        "el": {"L": []},
                        "em": {"M": {}},
                        "es": {"S": ""},
                        "sn": {"S": None},
                    }
                ),
            ),
            ("delete", _k(2), None),
            ("insert", _k(3), None),  # missing image -> keys fallback
            ("update", _k(4), json.dumps({"id": {"S": "k4"}, "bad": {}})),
            ("insert", "{not json", json.dumps({"x": {"S": "y"}})),
            ("insert", _k(5), json.dumps({"id": {"S": "k5"}, "u": {"XX": 1}})),
            ("insert", _k(6), json.dumps({"id": {"S": "k6"}, "nb": {"N": "zz"}})),
            # pk field that is itself a varied list -> pk AND untyped
            (
                "insert",
                json.dumps({"vk": {"S": "x"}}),
                json.dumps(
                    {"vk": {"L": [{"N": 1}, {"S": "s"}]}, "o": {"N": "7"}}
                ),
            ),
        ],
    )


def _rand_descriptor(rng: random.Random, depth: int):
    markers = ["S", "N", "BOOL", "NULL", "B", "SS", "NS", "BS"]
    if depth > 0:
        markers += ["M", "L", "M", "L"]
    m = rng.choice(markers)
    if m == "S":
        return {"S": rng.choice(["", "plain", 'q"uote', "uni·é", "a\nb", "x" * 40])}
    if m == "N":
        return {"N": rng.choice(["0", "-7", "123456789", "84.84", "1e3", "0.25"])}
    if m == "BOOL":
        return {"BOOL": rng.random() < 0.5}
    if m == "NULL":
        return {"NULL": True}
    if m == "B":
        return {"B": "U3Vubnk="}
    if m == "SS":
        return {"SS": rng.sample(["a", "b", "c", "dd", "é"], rng.randint(1, 4))}
    if m == "NS":
        return {"NS": rng.sample([1, 2.5, -3, 400, 0.125], rng.randint(1, 4))}
    if m == "BS":
        return {"BS": rng.sample(["YQ==", "Yg==", "Yw=="], rng.randint(1, 3))}
    if m == "M":
        return {
            "M": {
                f"f{j}": _rand_descriptor(rng, depth - 1)
                for j in range(rng.randint(0, 3))
            }
        }
    return {"L": [_rand_descriptor(rng, depth - 1) for _ in range(rng.randint(0, 3))]}


def test_random_corpus_cross_check(spark):
    """120 seeded random images, nesting up to depth 3 (within the unroll)."""
    rng = random.Random(7)
    rows = []
    for i in range(120):
        image = {
            "id": {"S": f"k{i}"},
            **{
                f"c{j}": _rand_descriptor(rng, 3)
                for j in range(rng.randint(1, 5))
            },
        }
        rows.append(("insert", _k(i), json.dumps(image)))
    _cross_check(spark, rows, max_depth=4)


def test_depth_wall_routes_to_arrow_fallback(spark):
    """Nesting beyond max_depth must come back via the Arrow kernel, exact."""
    deep = {"S": "bottom"}
    for lvl in range(6):
        deep = {"M": {f"lvl{lvl}": deep}}
    rows = [
        ("insert", _k(1), json.dumps({"id": {"S": "k1"}, "d": deep})),
        ("insert", _k(2), json.dumps({"id": {"S": "k2"}, "s": {"S": "flat"}})),
    ]
    _cross_check(spark, rows, max_depth=2)


def test_no_fallback_flags_deep_rows(spark):
    deep = {"M": {"a": {"M": {"b": {"M": {"c": {"S": "x"}}}}}}}
    df = spark.createDataFrame(
        [("insert", _k(1), json.dumps({"id": {"S": "k1"}, "d": deep}))],
        "op string, keys_json string, image string",
    )
    out = decode_universal_jvm(df, max_depth=1, fallback=False).collect()
    assert out[0]["_deep"] is True


def test_jvm_only_plan_without_fallback(spark):
    """fallback=False keeps the whole decode inside the JVM: the physical
    plan must contain no Python/Pandas eval nodes."""
    df = spark.createDataFrame(
        [("insert", _k(1), json.dumps({"id": {"S": "k1"}, "n": {"N": "1"}}))],
        "op string, keys_json string, image string",
    )
    plan = (
        decode_universal_jvm(df, max_depth=4, fallback=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_sets_sorted_and_floats_formatted(spark):
    """Direct value pins (not just kernel agreement): sorted sets, N->float
    with Python-repr formatting of integral doubles."""
    df = spark.createDataFrame(
        [
            (
                "insert",
                _k(1),
                json.dumps(
                    {
                        "id": {"S": "k1"},
                        "ns": {"NS": ["3", "1", "2.5"]},
                        "big": {"N": "123456789"},
                    }
                ),
            )
        ],
        "op string, keys_json string, image string",
    )
    row = decode_universal_jvm(df, max_depth=2).collect()[0]
    assert row["typed"]["ns"] == "[1.0,2.5,3.0]"
    # Java alone would print 1.23456789E8; the decoder must match json.dumps
    assert row["typed"]["big"] == "123456789.0"

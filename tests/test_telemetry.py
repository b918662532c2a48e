"""Telemetry decoder goldens (D10–D14), mirroring the reference's
`tests/decode/test_tasmota.py`, `test_sensor_community.py`, `test_tts_ttn.py`.
"""

import json

from commons_codec_spark.functions import telemetry as tel


def test_is_number():
    assert tel.is_number("3.14") and tel.is_number("-66") and tel.is_number(3)
    assert tel.is_number("٣")  # unicode numeral
    assert not tel.is_number("NRZ-2018-123B") and not tel.is_number(None)


def test_tasmota_sensor_flat_and_ds_subtree():
    payload = json.dumps(
        {
            "Time": "2017-10-05T22:39:45",
            "DS18x20": {
                "DS1": {"Type": "DS18B20", "Address": "28FF4C", "Temperature": 25.37},
                "DS2": {"Type": "DS18B20", "Address": "28FF1E", "Temperature": 30.44},
            },
            "DHT22": {"Temperature": 33.2, "Humidity": 30},
            "TempUnit": "C",
        }
    )
    assert tel.decode_tasmota_sensor(payload) == {
        "Time": "2017-10-05T22:39:45",
        "DS18x20.DS1.Temperature": 25.37,
        "DS18x20.DS2.Temperature": 30.44,
        "DHT22.Temperature": 33.2,
        "DHT22.Humidity": 30,
    }


def test_tasmota_state():
    payload = json.dumps(
        {
            "Time": "2019-06-02T22:13:07",
            "Uptime": "1T18:10:35",
            "Vcc": 3.182,
            "Sleep": 50,
            "LoadAvg": 19,
            "Wifi": {"AP": 1, "Channel": 1, "RSSI": 100, "LinkCount": 1},
        }
    )
    assert tel.decode_tasmota_state(payload) == {
        "Time": "2019-06-02T22:13:07",
        "Device.Vcc": 3.182,
        "Device.Sleep": 50,
        "Device.LoadAvg": 19,
        "Device.Wifi.Channel": 1,
        "Device.Wifi.RSSI": 100,
        "Device.Wifi.LinkCount": 1,
    }


def test_sensor_community_coercion():
    payload = json.dumps(
        {
            "esp8266id": 12041741,
            "sensordatavalues": [
                {"value_type": "SDS_P1", "value": "35.67"},
                {"value_type": "samples", "value": "3016882"},
                {"value_type": "signal", "value": "-66"},
                {"value_type": "note", "value": "NRZ-2018-123B"},
            ],
        }
    )
    out = tel.decode_sensor_community(payload)
    assert out == {
        "SDS_P1": 35.67,
        "samples": 3016882,
        "signal": -66,
        "note": "NRZ-2018-123B",
    }
    assert isinstance(out["samples"], int) and isinstance(out["SDS_P1"], float)


def test_tts_ttn_uplink():
    payload = json.dumps(
        {
            "end_device_ids": {"device_id": "dev-1"},
            "received_at": "2020-01-01T00:00:00Z",
            "uplink_message": {
                "f_cnt": 10,
                "decoded_payload": {"temperature": 21.5},
                "settings": {
                    "data_rate": {"lora": {"bandwidth": 125000, "spreading_factor": 7}},
                    "frequency": "868300000",
                },
                "rx_metadata": [
                    {"gateway_ids": {"gateway_id": "gw1"}, "rssi": -70, "snr": 9.25},
                    {"gateway_ids": {"gateway_id": "gw2"}, "rssi": -90, "snr": 5.5},
                ],
            },
        }
    )
    assert tel.decode_tts_ttn(payload) == {
        "device_id": "dev-1",
        "timestamp": "2020-01-01T00:00:00Z",
        "temperature": 21.5,
        "bw": 125.0,
        "sf": 7,
        "freq": 868.3,
        "counter": 10,
        "gtw_count": 2,
        "gw_gw1_rssi": -70,
        "gw_gw1_snr": 9.25,
        "gw_gw2_rssi": -90,
        "gw_gw2_snr": 5.5,
    }


def test_vectorized_telemetry(spark):
    rows = [
        (1, json.dumps({"Time": "t1", "DHT22": {"Temperature": 33.2}})),
        (2, "{bad json"),
    ]
    df = spark.createDataFrame(rows, "id long, payload string")
    out = tel.decode_telemetry(df, "tasmota_sensor")
    typed = tel.readings_to_columns(
        out, {"Time": "string", "DHT22.Temperature": "double"}
    )
    rows = {r.id: r for r in typed.collect()}
    assert rows[1].asDict()["DHT22.Temperature"] == 33.2
    assert rows[1].Time == "t1" and rows[1].error is None
    assert rows[2].error is not None


def test_tts_ttn_jvm_matches_arrow_kernel(spark):
    """JVM expression decoder vs the Python-kernel decode over the same
    uplinks, including missing sections, poison JSON, and NULL payloads."""
    import pyspark.sql.functions as F

    from commons_codec_spark.functions.telemetry import (
        decode_telemetry,
        decode_tts_ttn_jvm,
        readings_to_columns,
    )

    full = (
        '{"end_device_ids":{"device_id":"dev-5"},'
        '"received_at":"2024-06-01T10:00:00Z",'
        '"uplink_message":{"decoded_payload":{"temp":21,"hum":40},'
        '"settings":{"data_rate":{"lora":{"bandwidth":125000,'
        '"spreading_factor":9}},"frequency":"867500000"},'
        '"f_cnt":17,"rx_metadata":['
        '{"gateway_ids":{"gateway_id":"alpha"},"rssi":-71,"snr":9.25},'
        '{"gateway_ids":{"gateway_id":"beta"},"rssi":-90,"snr":-1.5}]}}'
    )
    no_uplink = '{"end_device_ids":{"device_id":"dev-6"}}'
    rows = [(1, full), (2, no_uplink), (3, "{nope"), (4, None)]
    df = spark.createDataFrame(rows, "event_id long, payload string")
    cols = {
        "device_id": "string",
        "timestamp": "string",
        "temp": "long",
        "hum": "long",
        "bw": "double",
        "sf": "long",
        "freq": "double",
        "counter": "long",
        "gtw_count": "long",
        "gw_alpha_rssi": "long",
        "gw_alpha_snr": "double",
        "gw_beta_rssi": "long",
        "gw_beta_snr": "double",
    }
    a = (
        readings_to_columns(decode_telemetry(df, "tts_ttn"), cols)
        .drop("reading")
        .orderBy("event_id")
        .collect()
    )
    b = (
        readings_to_columns(decode_tts_ttn_jvm(df), cols)
        .drop("reading")
        .orderBy("event_id")
        .collect()
    )
    for x, y in zip(a, b):
        for k in cols:
            assert x[k] == y[k], (k, x[k], y[k])
        assert (x["error"] is None) == (y["error"] is None)

    plan = decode_tts_ttn_jvm(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_tasmota_state_and_sensor_community_jvm_match_kernels(spark):
    """The two fixed-shape JVM decoders vs their Arrow kernels, including
    poison rows and duplicate value_type keys (dict last-wins)."""
    import json as _json

    import pyspark.sql.functions as F

    from commons_codec_spark.functions.telemetry import (
        decode_sensor_community_jvm,
        decode_tasmota_state_jvm,
        decode_telemetry,
        readings_to_columns,
    )

    st = _json.dumps(
        {
            "Time": "2024-06-01T10:00:00",
            "Vcc": 3.2,
            "Sleep": 50,
            "LoadAvg": 19,
            "Wifi": {"Channel": 11, "RSSI": 72, "LinkCount": 1},
        }
    )
    df = spark.createDataFrame(
        [(1, st), (2, "{bad"), (3, None)], "event_id long, payload string"
    )
    cols = {
        "Time": "string",
        "Device.Vcc": "double",
        "Device.Sleep": "long",
        "Device.Wifi.RSSI": "long",
        "Device.Wifi.LinkCount": "long",
    }
    a = readings_to_columns(decode_telemetry(df, "tasmota_state"), cols).orderBy("event_id").collect()
    b = readings_to_columns(decode_tasmota_state_jvm(df), cols).orderBy("event_id").collect()
    for x, y in zip(a, b):
        for k in cols:
            assert x[k] == y[k], (k, x[k], y[k])
        assert (x["error"] is None) == (y["error"] is None)

    sc = _json.dumps(
        {
            "sensordatavalues": [
                {"value_type": "P1", "value": "12.5"},
                {"value_type": "signal", "value": "-71"},
                {"value_type": "note", "value": "ok"},
                {"value_type": "P1", "value": "99"},  # dup: last wins
            ]
        }
    )
    df2 = spark.createDataFrame(
        [(1, sc), (2, "{x")], "event_id long, payload string"
    )
    cols2 = {"P1": "double", "signal": "long", "note": "string"}
    a2 = readings_to_columns(decode_telemetry(df2, "sensor_community"), cols2).orderBy("event_id").collect()
    b2 = readings_to_columns(decode_sensor_community_jvm(df2), cols2).orderBy("event_id").collect()
    for x, y in zip(a2, b2):
        for k in cols2:
            assert x[k] == y[k], (k, x[k], y[k])
        assert (x["error"] is None) == (y["error"] is None)
    assert b2[0]["P1"] == 99.0

    for d in (decode_tasmota_state_jvm(df), decode_sensor_community_jvm(df2)):
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_tts_ttn_jvm_duplicate_keys_last_wins(spark):
    """ADVICE r2: a decoded_payload key colliding with a derived key, or a
    duplicate gateway_id in rx_metadata, must NOT throw DUPLICATED_MAP_KEY
    (default mapKeyDedupPolicy=EXCEPTION) — last entry wins, matching the
    Arrow kernel's dict-assignment order exactly."""
    from commons_codec_spark.functions.telemetry import (
        decode_telemetry,
        decode_tts_ttn_jvm,
    )

    collide = (
        '{"end_device_ids":{"device_id":"dev-1"},'
        '"received_at":"2024-06-01T10:00:00Z",'
        '"uplink_message":{"decoded_payload":'
        '{"bw":"payload-bw","device_id":"payload-dev","temp":3},'
        '"settings":{"data_rate":{"lora":{"bandwidth":125000,'
        '"spreading_factor":7}},"frequency":"868100000"},'
        '"f_cnt":2,"rx_metadata":['
        '{"gateway_ids":{"gateway_id":"g1"},"rssi":-70,"snr":5},'
        '{"gateway_ids":{"gateway_id":"g1"},"rssi":-80,"snr":1}]}}'
    )
    df = spark.createDataFrame([(1, collide)], "event_id long, payload string")
    jvm = decode_tts_ttn_jvm(df).collect()[0]
    ref = decode_telemetry(df, "tts_ttn").collect()[0]
    assert jvm["error"] is None and ref["error"] is None
    r = jvm["reading"]
    # derived bw (assigned after payload update in the kernel) wins
    assert r["bw"] == "125.0"
    # payload device_id (update() runs after the initial assignment) wins
    assert r["device_id"] == "payload-dev"
    # duplicate gateway: LAST rx_metadata entry wins
    assert r["gw_g1_rssi"] == "-80" and r["gw_g1_snr"] == "1"
    # same winners as the Arrow kernel (values JSON-encoded there)
    import json as _json

    kr = ref["reading"]
    assert _json.loads(kr["bw"]) == 125.0
    assert _json.loads(kr["device_id"]) == "payload-dev"
    assert _json.loads(kr["gw_g1_rssi"]) == -80


def test_tts_ttn_jvm_nonnumeric_settings_total(spark):
    """Non-numeric bandwidth/frequency must not crash under ANSI mode —
    try_cast decodes them as absent keys (documented divergence #2)."""
    from commons_codec_spark.functions.telemetry import decode_tts_ttn_jvm

    bad = (
        '{"end_device_ids":{"device_id":"dev-2"},'
        '"uplink_message":{"decoded_payload":{"t":1},'
        '"settings":{"data_rate":{"lora":{"bandwidth":"zz",'
        '"spreading_factor":7}},"frequency":"not-a-number"}}}'
    )
    df = spark.createDataFrame([(1, bad)], "event_id long, payload string")
    row = decode_tts_ttn_jvm(df).collect()[0]
    assert row["error"] is None
    assert "bw" not in row["reading"] and "freq" not in row["reading"]
    assert row["reading"]["sf"] == "7"


def test_tasmota_sensor_jvm_matches_arrow_kernel(spark):
    """The recursive D10 flatten as nested from_json: every kernel branch
    — Time passthrough, scalar depth-2, typed DS subtree (Type/Address
    stripped), untyped depth-3 skipped, non-dict top values ignored,
    poison + non-object payloads error — and a Python-free plan."""
    import json as _json

    from commons_codec_spark.functions.telemetry import (
        decode_tasmota_sensor_jvm,
        decode_telemetry,
    )

    payloads = [
        # all branches at once
        ('{"Time":"t0","ANALOG":{"Temperature1":33,"Bias":-2},'
         '"SML":{"m0":{"Type":"counter","Address":"0x1","Total_in":7,"Volts":231.5},'
         '"m1":{"NoType":1}},"TempUnit":"C","Switch1":"ON"}'),
        # no Time; boolean and null-ish scalars
        '{"DHT22":{"Temperature":21.4,"Humidity":60,"Alive":true}}',
        # deep subtree without Type at depth 3 contributes nothing
        '{"X":{"y":{"z":{"Deep":1}}}}',
        "{broken",
        '"just-a-string"',
        "[1,2,3]",
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id long, payload string"
    )
    jvm = {r["id"]: r for r in decode_tasmota_sensor_jvm(df).collect()}
    ref = {r["id"]: r for r in decode_telemetry(df, "tasmota_sensor").collect()}

    for i in range(len(payloads)):
        assert (jvm[i]["error"] is None) == (ref[i]["error"] is None), i
        if ref[i]["error"] is not None:
            continue
        # same key sets; values equal after JSON-decoding the kernel's
        # encoding (the JVM form carries raw scalar texts)
        assert set(jvm[i]["reading"]) == set(ref[i]["reading"]), i
        for k, v in ref[i]["reading"].items():
            decoded = _json.loads(v)
            raw = jvm[i]["reading"][k]
            if isinstance(decoded, str):
                assert raw == decoded, (i, k)
            elif isinstance(decoded, bool):
                assert raw == ("true" if decoded else "false"), (i, k)
            else:
                assert float(raw) == float(decoded), (i, k)

    r0 = jvm[0]["reading"]
    assert r0["Time"] == "t0"
    # top-level non-dict values (TempUnit, Switch1) contribute nothing
    assert set(r0) == {
        "Time", "ANALOG.Temperature1", "ANALOG.Bias",
        "SML.m0.Total_in", "SML.m0.Volts",
    }
    assert jvm[2]["reading"] == {}  # untyped deep subtree: nothing
    assert jvm[3]["error"] and jvm[4]["error"] and jvm[5]["error"]

    plan = decode_tasmota_sensor_jvm(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan

"""Telemetry JSON decoders (SURVEY.md §2.3 D10–D14).

Pure-dict decode semantics matching the reference decoders:

* Tasmota sensor flatten — nested JSON → dotted-path keys; DS-style
  subtrees (carrying ``Type``/``Address``) contribute their measurements
  minus those two fields (``decode/tasmota.py:22-112``)
* Tasmota state — fixed projection to ``Device.*`` keys
  (``decode/tasmota.py:115-150``)
* Sensor.Community — explode ``sensordatavalues[]`` to columns, numeric
  coercion with an integer whitelist (``decode/sensor_community.py:9-94``)
* TTS/TTN uplink — merge ``decoded_payload``; derive ``bw`` (/1000),
  ``freq`` (/1e6), ``sf``, ``counter``; dynamic per-gateway
  ``gw_<id>_rssi/snr`` columns; ``gtw_count`` (``decode/tts_ttn.py:29-73``)
* ``is_number`` incl. unicode numerals (``util/data.py:11-32``)

Spark form: these produce *dynamic* key sets (device-dependent), so the
vectorized wrapper emits one ``MapType(string,string)`` column of
JSON-encoded values per reading (one Arrow batch per Python call);
:func:`readings_to_columns` then pivots a chosen key set into typed
columns JVM-side.  Fixed-shape subsets (e.g. Tasmota state) can skip
Python entirely via ``from_json`` + aliased selects.
"""

from __future__ import annotations

import json
import unicodedata
from typing import Any, Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def is_number(value: Any) -> bool:
    """Numeric-string test incl. unicode numerals (D14)."""
    try:
        float(value)
        return True
    except (TypeError, ValueError):
        pass
    try:
        unicodedata.numeric(value)
        return True
    except (TypeError, ValueError):
        return False


# ---------------------------------------------------------------------------
# Pure decoders (payload JSON string -> flat dict)
# ---------------------------------------------------------------------------


def decode_tasmota_sensor(payload: str) -> dict:
    message = json.loads(payload)
    data: dict = {}
    if "Time" in message:
        data["Time"] = message["Time"]
    for key, value in message.items():
        if not isinstance(value, dict):
            continue
        for dkey, dvalue in value.items():
            if isinstance(dvalue, dict):
                if "Type" in dvalue:
                    sub = {
                        k: v for k, v in dvalue.items() if k not in ("Type", "Address")
                    }
                    for dskey, dsvalue in sub.items():
                        data[f"{key}.{dkey}.{dskey}"] = dsvalue
            else:
                data[f"{key}.{dkey}"] = dvalue
    return data


def decode_tasmota_state(payload: str) -> dict:
    message = json.loads(payload)
    wifi = message.get("Wifi", {})
    return {
        "Time": message.get("Time"),
        "Device.Vcc": message.get("Vcc"),
        "Device.Sleep": message.get("Sleep"),
        "Device.LoadAvg": message.get("LoadAvg"),
        "Device.Wifi.Channel": wifi.get("Channel"),
        "Device.Wifi.RSSI": wifi.get("RSSI"),
        "Device.Wifi.LinkCount": wifi.get("LinkCount"),
    }


SENSOR_COMMUNITY_INTEGERS = ["signal", "samples", "min_micro", "max_micro"]


def decode_sensor_community(payload: str) -> dict:
    message = json.loads(payload)
    data: dict = {}
    for item in message.get("sensordatavalues", []):
        key, value = item["value_type"], item["value"]
        if is_number(value):
            value = int(value) if key in SENSOR_COMMUNITY_INTEGERS else float(value)
        data[key] = value
    return data


def decode_tts_ttn(payload: str) -> dict:
    message = json.loads(payload)
    data: dict = {}
    if "end_device_ids" in message:
        data["device_id"] = message["end_device_ids"]["device_id"]
    if "received_at" in message:
        data["timestamp"] = message["received_at"]
    uplink = message.get("uplink_message")
    if uplink:
        data.update(uplink["decoded_payload"])
        if "settings" in uplink:
            lora = uplink["settings"]["data_rate"]["lora"]
            data["bw"] = float(lora["bandwidth"]) / 1000
            data["sf"] = lora["spreading_factor"]
            data["freq"] = float(uplink["settings"]["frequency"]) / 1000000.0
        if "f_cnt" in uplink:
            data["counter"] = int(uplink["f_cnt"])
        if "rx_metadata" in uplink:
            data["gtw_count"] = len(uplink["rx_metadata"])
            for rx in uplink["rx_metadata"]:
                gw = rx["gateway_ids"]["gateway_id"]
                data[f"gw_{gw}_rssi"] = rx["rssi"]
                data[f"gw_{gw}_snr"] = rx["snr"]
    return data


DECODERS: dict[str, Callable[[str], dict]] = {
    "tasmota_sensor": decode_tasmota_sensor,
    "tasmota_state": decode_tasmota_state,
    "sensor_community": decode_sensor_community,
    "tts_ttn": decode_tts_ttn,
}


# ---------------------------------------------------------------------------
# Vectorized form
# ---------------------------------------------------------------------------


def decode_telemetry(
    df: DataFrame, decoder: str, payload_col: str = "payload"
) -> DataFrame:
    """Decode a payload column into a ``reading`` map (Arrow-batched).

    Values are JSON-encoded to keep heterogeneous types in one map;
    malformed payloads land in ``error`` instead of raising.
    """
    fn = DECODERS[decoder]
    passthrough = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        list(passthrough)
        + [
            T.StructField("reading", T.MapType(T.StringType(), T.StringType())),
            T.StructField("error", T.StringType()),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            readings, errors = [], []
            for payload in pdf[payload_col]:
                try:
                    flat = fn(payload)
                    readings.append(
                        {k: json.dumps(v, separators=(",", ":")) for k, v in flat.items()}
                    )
                    errors.append(None)
                except Exception as exc:  # noqa: BLE001
                    readings.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
            out = pdf.drop(columns=[payload_col])
            out["reading"] = readings
            out["error"] = errors
            yield out

    return df.mapInPandas(_map, schema=out_schema)


def readings_to_columns(
    df: DataFrame, columns: dict[str, str], reading_col: str = "reading"
) -> DataFrame:
    """Pivot chosen reading keys into typed top-level columns (JVM-side).

    ``columns`` maps reading key -> spark type; values were JSON-encoded,
    so strings unquote and scalars cast directly.
    """
    out = []
    for key, dtype in columns.items():
        raw = F.col(reading_col)[key]
        col = (
            F.translate(raw, '"', "").alias(key)
            if dtype == "string"
            else raw.cast(dtype).alias(key)
        )
        out.append(col)
    return df.select("*", *out)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC replay at sf0.001; ``queries()`` /
``oracle_sql()`` expose each implemented operator (SURVEY.md §2) paired
with a DuckDB-checkable ANSI-SQL oracle.  Implementations live in
``commons_codec_spark/`` — this file is just the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _ensure_worker_path(spark: SparkSession) -> None:
    """Make the package importable in Python workers (pandas-UDF queries)."""
    try:
        spark.sparkContext.addPyFile  # probe
        paths = os.environ.get("PYTHONPATH", "")
        if _REPO not in paths.split(os.pathsep):
            os.environ["PYTHONPATH"] = _REPO + (os.pathsep + paths if paths else "")
    except Exception:  # noqa: BLE001
        pass
    # Ship the package as an archive so already-started executors see it too.
    import glob
    import zipfile

    zip_path = os.path.join("/tmp", "commons_codec_spark_pkg.zip")
    sources = glob.glob(
        os.path.join(_REPO, "commons_codec_spark", "**", "*.py"), recursive=True
    )
    newest = max(os.path.getmtime(f) for f in sources)
    # rebuild when any source is newer — a stale cached zip would shadow
    # current code inside Python workers
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest:
        with zipfile.ZipFile(zip_path, "w") as zf:
            for f in sources:
                zf.write(f, os.path.relpath(f, _REPO))
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:  # noqa: BLE001 — already added
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC envelope encode -> decode -> fold -> final state."""
    _ensure_worker_path(spark)
    from commons_codec_spark.queries import q_cdc_replay_final_state

    return q_cdc_replay_final_state(spark, "/root/testdata/sf0.001")


def _all_queries() -> dict:
    from commons_codec_spark.queries import CORE_QUERIES
    from commons_codec_spark.queries_engine import ENGINE_QUERIES
    from commons_codec_spark.queries_extra import EXTRA_QUERIES
    from commons_codec_spark.queries_pipeline import PIPELINE_QUERIES
    from commons_codec_spark.queries_wire import WIRE_QUERIES

    return {
        **CORE_QUERIES,
        **PIPELINE_QUERIES,
        **EXTRA_QUERIES,
        **ENGINE_QUERIES,
        **WIRE_QUERIES,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_worker_path(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _sql) in _all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _all_queries().items() if sql}

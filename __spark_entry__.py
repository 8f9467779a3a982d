"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cflux_spark`` (see SURVEY.md §2 for the
operator inventory this catalog covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
# Spark python workers need the package importable too (mapInPandas).
_pp = os.environ.get("PYTHONPATH", "")
if _REPO_ROOT not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO_ROOT + (os.pathsep + _pp if _pp else "")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: time filter → series
    registry broadcast join → 1-minute tumbling avg → sort
    (SURVEY.md §3.2's whole SELECT path as one DataFrame plan)."""
    from cflux_spark.plans.queries import QUERIES
    from cflux_spark.session import ensure_worker_imports

    ensure_worker_imports(spark)
    return QUERIES["q_minute_avg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cflux_spark.plans.queries import QUERIES
    from cflux_spark.session import ensure_worker_imports

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver's session may predate this import — ship the
            # package to its Python workers before any pandas UDF runs
            ensure_worker_imports(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from cflux_spark.plans.queries import ORACLES

    return dict(ORACLES)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship zonal-aggregation pipeline on the
sf0.001 corpus; ``queries()``/``oracle_sql()`` expose the
oracle-paired registry from ``geodata_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geodata_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_zonal_daily_wavg(spark, "/root/testdata/sf0.001")


def _self_sufficient(fn: Callable) -> Callable:
    """Ship the package to executors before any query runs.

    Queries built on pandas UDFs reference geodata_spark modules from
    worker processes; without this, a query would only work if an
    earlier one had already triggered the addPyFile (order-dependent).
    """

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from geodata_spark.deploy import ensure_py_files

        ensure_py_files(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: _self_sufficient(v) for k, v in Q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each key in ``queries()``."""
    return dict(Q.ORACLES)

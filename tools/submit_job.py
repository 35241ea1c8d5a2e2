#!/usr/bin/env python
"""spark-submit entry point (north_rule deployment contract).

Run as::

    spark-submit --master <master> \
        --py-files /tmp/geodata_spark_pyfiles_<stamp>.zip \
        tools/submit_job.py <sf_dir>

The script imports ``geodata_spark`` ONLY from the --py-files zip
(its own directory does not contain the package), runs the flagship
zonal aggregation, and prints one JSON line — the minimal proof that
the engine deploys to a cluster with no repo checkout on any node.
tests/test_spark_submit.py executes this for real against a local
master from a neutral CWD.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("geodata_spark_submit_smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # import AFTER the session exists: in a spark-submit run the
    # package arrives via --py-files on driver and executors alike
    from geodata_spark import queries as Q

    rows = Q.q_zonal_daily_wavg(spark, sf_dir).collect()
    print(json.dumps({"query": "zonal_daily_wavg", "rows": len(rows)}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Ship the package to Python workers (the --py-files contract).

On a real cluster the engine runs ``spark-submit --py-files
geodata_spark.zip`` (north_rule).  When embedded in a host process
(the test driver) whose CWD is not the repo root, executors' Python
workers cannot import ``geodata_spark`` — UDF closures reference the
package by module path.  :func:`ensure_py_files` reproduces the
--py-files behavior at runtime: zip the package once and register it
with ``SparkContext.addPyFile`` (idempotent per session).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SENT = "_geodata_spark_pyfiles_shipped"


def package_zip_path() -> str:
    """Build (or reuse) a zip of the geodata_spark package."""
    import geodata_spark

    pkg_dir = os.path.dirname(os.path.abspath(geodata_spark.__file__))
    stamp = max(
        os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(pkg_dir)
        for f in fs
        if f.endswith(".py")
    )
    zpath = os.path.join(
        tempfile.gettempdir(), f"geodata_spark_pyfiles_{int(stamp)}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as zf:
            for dp, _, fs in os.walk(pkg_dir):
                for f in fs:
                    if f.endswith(".py"):
                        full = os.path.join(dp, f)
                        rel = os.path.join(
                            "geodata_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
        os.replace(tmp, zpath)
    return zpath


def ensure_py_files(spark: SparkSession) -> None:
    """Make ``geodata_spark`` importable on executor Python workers."""
    sc = spark.sparkContext
    if getattr(sc, _SENT, False):
        return
    sc.addPyFile(package_zip_path())
    setattr(sc, _SENT, True)

"""Ship the scanner_spark package to executors.

On a real cluster the package is distributed with ``--py-files``; when the
engine is driven from an arbitrary SparkSession (the correctness driver, a
notebook), ``ship(spark)`` zips the package and ``addPyFile``s it so UDF
closures that reference scanner_spark modules deserialize on executors.
Idempotent and cheap (the zip is content-addressed by mtime).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_shipped: set[str] = set()


def _pkg_root() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def ship(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id in _shipped:
        return
    pkg = _pkg_root()
    stamp = max(
        int(os.path.getmtime(os.path.join(dp, f)))
        for dp, _, fs in os.walk(pkg)
        for f in fs
        if f.endswith(".py")
    )
    zpath = os.path.join(tempfile.gettempdir(), f"scanner_spark_{stamp}.zip")
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for dp, _, fs in os.walk(pkg):
                for f in fs:
                    if f.endswith(".py"):
                        full = os.path.join(dp, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg))
                        z.write(full, rel)
        os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)
    _shipped.add(app_id)

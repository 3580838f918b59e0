"""get_file_list — list files matching a path/pattern at a location.

Reference: ``python-sdk/src/astro/files/__init__.py:9-30``,
``files/operators/files.py:13-43``.

Local paths use glob; remote schemes (s3a://, gs://, ...) go through
Hadoop's FileSystem.globStatus via the JVM gateway so executors and driver
agree on what exists.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import SparkSession

from astro_sdk_spark.session import default_session


def get_file_list(path: str, spark: SparkSession | None = None) -> list[str]:
    s = spark or default_session()
    if "://" not in path or path.startswith("file://"):
        p = path.removeprefix("file://")
        if os.path.isdir(p):
            p = os.path.join(p, "*")
        return sorted(_glob.glob(p))
    # Hadoop FS glob for object stores
    jvm = s._jvm
    conf = s._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    statuses = fs.globStatus(hpath)
    if statuses is None:
        return []
    return sorted(str(st.getPath()) for st in statuses)

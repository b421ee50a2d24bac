"""Cluster deployment helper — ship the package to executors.

On a real cluster the engine runs via ``spark-submit --py-files
geowave_spark.zip`` (north rule).  When the session is created by a host
process instead (the driver's verify harness, a notebook), executors still
need the package on their PYTHONPATH to unpickle our pandas UDFs —
``ensure_py_files(spark)`` zips the package once and registers it with
``SparkContext.addPyFile``, the programmatic equivalent of --py-files.
Every public operator entry point calls it; it is a no-op after the first
call per session.
"""

from __future__ import annotations

import os
import zipfile

_SHIPPED: set[int] = set()


def build_zip(path: str | None = None) -> str:
    """Zip the geowave_spark package (deterministic contents)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = path or os.path.join("/tmp", "geowave_spark_pyfiles.zip")
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join("geowave_spark", os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    os.replace(tmp, out)
    return out


def ensure_py_files(spark) -> None:
    """Make the package importable on executors (idempotent per session)."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    try:
        sc.addPyFile(build_zip())
    except Exception:
        # already added under the same name in this context — fine
        pass
    _SHIPPED.add(key)

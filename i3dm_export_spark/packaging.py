"""spark-submit --py-files packaging (north_rule shipping requirement).

:func:`build_pyfiles_zip` produces the zip handed to
``spark-submit --py-files``; :func:`ensure_shipped` is the in-process
equivalent — it registers the zip on a live SparkSession via
``addPyFile`` so Python workers can import ``i3dm_export_spark`` no
matter what the driver's cwd/sys.path looks like (pandas UDFs pickle
references to this module; without shipping, executors raise
ModuleNotFoundError when the session wasn't launched from the repo root).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SHIPPED_SESSIONS: set[int] = set()


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the package (source only) for --py-files. Returns the zip path."""
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), "i3dm_export_spark_pyfiles.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "i3dm_export_spark", os.path.relpath(full, _PKG_DIR)
                )
                zf.write(full, rel)
    return dest


def ensure_shipped(spark) -> None:
    """Idempotently ship the package to this session's Python workers."""
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    sc = spark.sparkContext
    zip_path = build_pyfiles_zip()
    sc.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)

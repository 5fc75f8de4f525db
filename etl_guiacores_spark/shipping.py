"""Make the package importable on executor Python workers.

Executors do NOT inherit the driver's ``sys.path`` — a ``mapInPandas``
closure that references this package by module would die with
ModuleNotFoundError on any cluster (or any driver started outside the
repo root). Two independent guards:

1. ``register_udf_module(module)`` — cloudpickle serializes that
   module's functions BY VALUE, so closures travel self-contained
   inside the serialized task and never import the package on the
   worker. Called at import time by every module that builds UDFs.
2. ``ensure_package_shipped(spark)`` — zips the package and
   ``addPyFile``s it, covering user-written UDFs that import us.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from types import ModuleType

_registered: set[str] = set()
_shipped: set[int] = set()


def register_udf_module(module: ModuleType) -> None:
    if module.__name__ in _registered:
        return
    # PySpark serializes closures with its VENDORED cloudpickle —
    # registering with the standalone package does nothing. Register
    # with both (the standalone one covers e.g. joblib users).
    from pyspark import cloudpickle as spark_cloudpickle

    spark_cloudpickle.register_pickle_by_value(module)
    try:
        import cloudpickle

        cloudpickle.register_pickle_by_value(module)
    except ImportError:
        pass
    _registered.add(module.__name__)


def ensure_package_shipped(spark) -> str | None:
    """Zip etl_guiacores_spark and addPyFile it (idempotent per session)."""
    key = id(spark)
    if key in _shipped:
        return None
    import etl_guiacores_spark

    pkg_dir = os.path.dirname(os.path.abspath(etl_guiacores_spark.__file__))
    # collect sources deterministically and key the zip on their
    # content hash: a fixed /tmp name would keep shipping STALE code
    # after any deploy on a long-lived host, and two drivers racing a
    # plain write could publish a truncated archive. Content-addressed
    # name + atomic rename solve both (same content -> same file; a
    # half-written temp never becomes visible).
    sources = []
    digest = hashlib.sha256()
    for root, _dirs, files in sorted(
        (r, d, f) for r, d, f in os.walk(pkg_dir)
    ):
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "etl_guiacores_spark", os.path.relpath(full, pkg_dir)
                )
                with open(full, "rb") as fh:
                    data = fh.read()
                digest.update(rel.encode())
                digest.update(data)
                sources.append((full, rel))
    zip_path = os.path.join(
        tempfile.gettempdir(),
        f"etl_guiacores_spark_pkg_{digest.hexdigest()[:16]}.zip",
    )
    if not os.path.exists(zip_path):
        tmp = f"{zip_path}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for full, rel in sources:
                zf.write(full, rel)
        os.replace(tmp, zip_path)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        # Spark Connect sessions have no sparkContext; by-value
        # registration (guard #1) still covers our own UDFs there.
        return None
    _shipped.add(key)
    return zip_path

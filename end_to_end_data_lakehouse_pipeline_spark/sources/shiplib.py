"""Ship this package to executors at runtime.

Python DataSource readers/writers (duckdb_source, txnlog_source) are
unpickled on executors BY MODULE REFERENCE, so the package must be
importable in the worker processes. When the launcher controlled the
environment that is ``--py-files``/PYTHONPATH; when it did not (a
foreign harness session), ``ensure_shipped(spark)`` zips the package
once per session and ``addPyFile``s it — Spark distributes the zip and
appends it to every worker's sys.path. Idempotent per SparkContext."""

from __future__ import annotations

import os
import zipfile

_FLAG = "_end_to_end_data_lakehouse_pipeline_spark_shipped"


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"{pkg_name}_{sc.applicationId}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    # addPyFile covers EXECUTOR workers, but streaming Python data sources
    # are also planned in a separate driver-side Python worker that
    # unpickles the DataSource by module reference BEFORE pyFiles land on
    # its sys.path. Registering the connector modules (and their intra-
    # package dependency chain) for by-value pickling makes the payload
    # carry the class code itself — importable-nowhere-safe.
    from pyspark import cloudpickle

    from ..functions import zorder
    from . import duckdb_source, lakehouse, txnlog, txnlog_source

    for mod in (duckdb_source, txnlog_source, txnlog, lakehouse, zorder):
        cloudpickle.register_pickle_by_value(mod)
    setattr(sc, _FLAG, True)

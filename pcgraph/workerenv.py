"""Once-per-process tuning for reused PySpark workers.

Reused Python workers (``spark.python.worker.reuse``, on by default) pay
two fixed costs on EVERY task, measured at ~170 ms combined with the
engine's import set (numpy/pandas/pyarrow/pcgraph) — larger than an
entire sf0.1 kernel invocation (~10 ms):

1. ``pyspark.worker_util.setup_spark_files`` calls
   ``importlib.invalidate_caches()`` per task, and every zip archive on
   the worker's ``sys.path`` (pyspark.zip, py4j zip — shipped by Spark
   itself on every deployment) re-reads its entire zip central
   directory each time (~150 ms/task profiled via cProfile in the
   worker: 16 ``zipimport._read_directory`` calls, 80k reads).  Spark
   distributes code archives immutably — a new/changed py-file lands at
   a NEW path and gets a fresh finder on first import — so rescanning
   existing archives buys nothing.  ``optimize_worker`` makes
   ``zipimporter.invalidate_caches`` a no-op in this process;
   directory (FileFinder) invalidation is untouched, so runtime-added
   plain ``.py`` files keep working exactly as before.

2. ``pyspark.daemon``'s reuse loop runs ``gc.collect()`` after every
   task.  A full collection walks every tracked object, dominated by
   the imported module graph; a task assigned to a worker still inside
   that collection waits for it (measured as a convoy: 32-task python
   stages ramp 120->250 ms/task).  ``gc.freeze()`` moves the
   already-imported permanent objects out of the collector's reach
   (the standard prefork-server pattern), so the per-task collection
   only examines task-created objects.  Refcounting still frees frozen
   objects normally; only pre-freeze cyclic garbage would be pinned,
   which the ``gc.collect()`` right before the freeze clears.

Both effects are per-process and guarded, so calling this at every
kernel entry costs one attribute check after the first call.
"""

from __future__ import annotations

_done = False


def optimize_worker() -> None:
    global _done
    if _done:
        return
    _done = True
    import gc
    import zipimport

    try:
        zipimport.zipimporter.invalidate_caches = (  # type: ignore[method-assign]
            lambda self: None
        )
    except Exception:
        pass
    try:
        gc.collect()
        gc.freeze()
    except Exception:
        pass

"""duckdb_distributed_execution_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``dentiny/duckdb-distributed-execution`` (a DuckDB extension adding
distributed execution over Arrow Flight) as an idiomatic PySpark engine.

The reference's client/driver/worker star topology, task partitioner,
SQL-rewriting scatter, and result mergers all collapse into Spark's own
Catalyst planner, shuffle service and partial/final aggregation
(see SURVEY.md §0). What this package provides on top of a bare
``SparkSession`` is:

- ``Engine`` — session facade mirroring the reference's surface:
  table registration (``PRAGMA duckherder_register_remote_table`` →
  ``register_table``), DDL/DML (CREATE/DROP/ALTER TABLE, CREATE INDEX,
  INSERT, DELETE-with-true-predicate), a ``sql()`` entry point and an
  execution-stats table matching
  ``duckherder_get_query_execution_stats()``
  (reference: src/query_execution_stats_query_function.cpp:28-58).
- ``typemap`` — DuckDB↔Spark type fidelity per SURVEY §1.2
  (reference: src/utils/arrow_utils.cpp:498-620).
- ``operators`` — operators Spark lacks natively (as-of join, range
  join) plus the large-scale training-data pipeline suite: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search (brute-force + LSH-bucketed ANN), text analysis
  (language-ID, quality, token counts, fingerprints), multimodal
  binary-column plumbing.
- ``functions`` — vectorized column helpers (cosine similarity via
  ``F.zip_with``/``F.aggregate``, exact-decimal aggregation helpers).
"""

from duckdb_distributed_execution_spark.session import Engine

__all__ = ["Engine", "ensure_worker_pythonpath"]
__version__ = "0.1.0"


_PYFILES_ADDED: set[str] = set()


def ensure_worker_pythonpath(spark) -> None:
    """Ship this package to Spark's Python workers via ``addPyFile``.

    Operators that send Python closures to executors (the
    ``duckdb_remote`` Python DataSource, ``mapInPandas`` multimodal
    decode, ``applyInPandas`` sessionization) reference module-level
    helpers, which cloudpickle serializes BY REFERENCE — the worker
    process must be able to import the package. That import only
    works for free when the driver's CWD is the repo root (workers
    inherit it on sys.path); a harness launched from anywhere else
    gets ``ModuleNotFoundError`` in the worker. Zipping the package
    once per SparkContext and ``addPyFile``-ing it makes worker-side
    imports location-independent. Idempotent per application."""
    import os
    import shutil
    import tempfile

    sc = spark.sparkContext
    key = sc.applicationId
    if key in _PYFILES_ADDED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(
        tempfile.gettempdir(), f"dde_spark_pkg_{os.getpid()}"
    )
    zip_path = shutil.make_archive(
        base,
        "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir),
    )
    sc.addPyFile(zip_path)
    _PYFILES_ADDED.add(key)

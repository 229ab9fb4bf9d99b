"""The query inventory must be importable WITHOUT a SparkSession/JVM:
`tools/bench_duckdb.py` (the A/B baseline tool) and any embedder that
wants `oracle_sql()` for DuckDB-only use depend on it. Round 3
regressed this with a module-scope Window spec (pipeline15); this test
pins the fix by importing the full inventory in a clean subprocess
with spark-session creation booby-trapped.
"""

import subprocess
import sys

_PROBE = r"""
import sys

# Booby-trap JVM launch: constructing a SparkSession (or a py4j
# gateway) during import means the inventory is NOT sessionless.
import pyspark.java_gateway as jg


def _boom(*a, **k):
    raise AssertionError("inventory import tried to launch a JVM")


jg.launch_gateway = _boom

import __spark_entry__ as e

q = e.queries()
o = e.oracle_sql()
assert len(q) >= 290, len(q)
assert len(o) >= 290, len(o)
assert set(o) <= set(q)
print("OK", len(q), len(o))
"""


def test_inventory_imports_without_spark():
    res = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert res.stdout.startswith("OK")

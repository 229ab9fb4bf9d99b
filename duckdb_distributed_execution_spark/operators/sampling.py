"""Deterministic sampling & dataset splitting for training-data
pipelines (north-star greenfield — BASELINE.json).

Random sampling (``df.sample``) is irreproducible across engines,
partitionings, and reruns — useless for dataset curation, where a
sample must be re-derivable from the data alone. Every operator here
keys off a 60-bit md5 hash of a stable id (same convention as the
dedup suite), so:

- the same row lands in the same split on ANY cluster size, engine,
  or rerun (hash is a pure row function — no shuffle, no state);
- rates are exact in expectation and concentrate tightly at corpus
  scale;
- downstream joins between splits stay co-partitioned on the id.

All pure Column expressions: sampling is a filter Catalyst pushes
into the scan stage — zero shuffles, trivially 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_distributed_execution_spark.operators.dedup import hash60, oracle_hash60

# Salt distinguishes independent sampling decisions on the same key.
_BUCKETS = 1_000_000


def sample_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) derived from (key, salt) — the basis
    for rate filters and split assignment."""
    return hash60(F.concat(key.cast("string"), F.lit(f"|{salt}"))) % _BUCKETS


def oracle_sample_bucket(expr: str, salt: str) -> str:
    keyed = f"CAST({expr} AS VARCHAR) || '|{salt}'"
    return f"{oracle_hash60(keyed)} % {_BUCKETS}"


def hash_sample(df: DataFrame, key: Column, rate: float, salt: str) -> DataFrame:
    """Deterministic Bernoulli(rate) sample: keep rows whose bucket
    falls below rate·1e6. A pure filter — pushed to the scan."""
    return df.filter(sample_bucket(key, salt) < int(rate * _BUCKETS))


def assign_split(
    key: Column,
    splits: dict[str, float],
    salt: str = "split",
) -> Column:
    """Label each row train/val/test (or any named fractions summing
    to ≤1) by contiguous bucket ranges — mutually exclusive, exhaustive
    when fractions sum to 1, and stable under re-runs and re-shards."""
    bucket = sample_bucket(key, salt)
    expr = None
    lo = 0
    for name, frac in splits.items():
        hi = lo + int(frac * _BUCKETS)
        cond = (bucket >= F.lit(lo)) & (bucket < F.lit(hi))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return expr.otherwise("rest")


def oracle_assign_split(expr: str, splits: dict[str, float], salt: str = "split") -> str:
    bucket = oracle_sample_bucket(expr, salt)
    lo = 0
    cases = []
    for name, frac in splits.items():
        hi = lo + int(frac * _BUCKETS)
        cases.append(f"WHEN {bucket} >= {lo} AND {bucket} < {hi} THEN '{name}'")
        lo = hi
    joined = " ".join(cases)
    return f"CASE {joined} ELSE 'rest' END"


def stratified_downsample(
    df: DataFrame,
    strata: Column,
    key: Column,
    rates: dict[str, float],
    salt: str = "strat",
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic downsampling (e.g. cap an
    over-represented language or source). ``rates`` maps stratum value
    → keep rate; unlisted strata keep ``default_rate``. Still a pure
    filter: no shuffle, no per-group state, skew-immune."""
    rate_col = None
    for value, rate in rates.items():
        cond = strata == F.lit(value)
        hit = F.lit(int(rate * _BUCKETS))
        rate_col = F.when(cond, hit) if rate_col is None else rate_col.when(cond, hit)
    rate_col = (
        rate_col.otherwise(int(default_rate * _BUCKETS))
        if rate_col is not None
        else F.lit(int(default_rate * _BUCKETS))
    )
    return df.filter(sample_bucket(key, salt) < rate_col)

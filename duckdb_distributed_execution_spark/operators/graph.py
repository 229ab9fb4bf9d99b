"""Connected components over a pair/edge DataFrame — the capstone of
the dedup story: near-dup detectors (MinHash-LSH, SimHash, n-gram
Jaccard) emit PAIRS, but "keep one document per duplicate cluster"
needs the transitive closure of those pairs.  The reference has no
graph operators at all (its dedup surface is zero — this is
north-star greenfield per BASELINE.json); the parity bar is the
DuckDB recursive-CTE oracle in queries/llm.py.

Algorithm: iterative hash-min label propagation ("every vertex adopts
the smallest component id any neighbor has seen"), the standard
MapReduce/Spark formulation (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — the simple hash-min variant).  Each
iteration is one shuffle (groupBy vertex); the loop converges in
O(diameter) rounds, and near-dup clusters in a corpus are
shallow (boilerplate families — diameter a handful), so 3-6 rounds is
typical.  At 100 TB the same loop holds: labels are (long, long)
pairs — orders of magnitude smaller than the documents they
describe — and ``localCheckpoint`` every round keeps lineage flat so
round N does not replan rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable
    via the undirected edge set.  Only vertices that appear in at
    least one edge are returned (isolated docs are their own singleton
    cluster by definition — callers left-join and coalesce to doc_id).
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        # Propagate: each node offers its current label to every
        # neighbor; a node keeps the min of its own label and all
        # offers.  One shuffle per round.
        offers = und.join(labels, und["u"] == labels["node"]).select(
            F.col("v").alias("node"), F.col("comp")
        )
        new_labels = (
            labels.select("node", "comp")
            .union(offers)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def dedup_clusters(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster summary from a near-dup pair set: one row per duplicate
    cluster with the canonical keep id (min member) and member count.
    """
    cc = connected_components(edges, src, dst)
    return cc.groupBy(F.col("comp").alias("keep_id")).agg(
        F.count(F.lit(1)).alias("n_members")
    )

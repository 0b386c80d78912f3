"""Stage 3 — transitive clustering: large-star / small-star connected
components over the match-edge table.

Generalizes the reference's mention→entity assignment (each mention linked
to its argmax entity, run_e2e_span.py:570-575) to full entity-resolution
clusters: the transitive closure of pairwise matches.

Algorithm (Kiveris et al., 'Connected Components in MapReduce and
Beyond'): alternate
  large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u})
  small-star(u): connect every neighbor v ≤ u (v ≠ m) to m
until the edge set reaches a fixpoint — O(log n) rounds even on chains.
Each round is one groupBy + join; `localCheckpoint` every round truncates
the lineage (SURVEY.md §7b: iterative CC lineage blowup MUST checkpoint —
on a cluster use reliable `checkpoint()` to HDFS/Iceberg instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame, dedup: bool = False) -> DataFrame:
    """Both directions of every edge.  No distinct by default: the min
    aggregation inside _star is duplicate-insensitive and each star ends
    in its own distinct, so deduping here would just add a shuffle."""
    fwd = edges.select(F.col("src"), F.col("dst"))
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    out = fwd.union(rev).filter(F.col("src") != F.col("dst"))
    return out.distinct() if dedup else out


def _star(edges: DataFrame, large: bool) -> DataFrame:
    """One large- or small-star round.  Symmetrizes first: every node must
    see its full undirected neighborhood, including the parent pointers
    produced by the previous round."""
    edges = _symmetrize(edges)
    nbr_min = edges.groupBy("src").agg(F.min("dst").alias("mn"))
    m = nbr_min.select(
        "src", F.least(F.col("src"), F.col("mn")).alias("m")
    )
    joined = edges.join(m, "src")
    if large:
        moved = joined.filter(F.col("dst") > F.col("src"))
    else:
        moved = joined.filter(F.col("dst") <= F.col("src"))
    out = moved.select(F.col("dst").alias("src"), F.col("m").alias("dst")).union(
        m.select(F.col("src"), F.col("m").alias("dst"))
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(
    links: DataFrame,
    src_col: str = "url_a",
    dst_col: str = "url_b",
    max_iter: int = 20,
) -> DataFrame:
    """Edge table → (node, component) with component = min node id of the
    cluster.  Nodes absent from `links` are not emitted (callers union
    singletons back; see plans/linkage.py)."""
    edges = _symmetrize(
        links.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    ).localCheckpoint()
    prev_sig = None
    for _ in range(max_iter):
        edges = _star(_star(edges, large=True), large=False)
        edges = edges.localCheckpoint()  # cut lineage every round
        sig = _signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig
    # fixpoint: edges are (member, root) stars
    comp = edges.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = comp.select(F.col("component").alias("node"), F.col("component"))
    return comp.union(roots).groupBy("node").agg(F.min("component").alias("component"))

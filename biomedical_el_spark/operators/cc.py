"""Stage 3 — transitive clustering: large-star / small-star connected
components over the match-edge table.

Generalizes the reference's mention→entity assignment (each mention linked
to its argmax entity, run_e2e_span.py:570-575) to full entity-resolution
clusters: the transitive closure of pairwise matches.

Algorithm (Kiveris et al., 'Connected Components in MapReduce and
Beyond'): alternate
  large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u})
  small-star(u): connect every neighbor v ≤ u (v ≠ m) to m
until the edge set is a set of min-rooted stars — O(log n) rounds even on
chains.  Convergence is detected by a STAR CERTIFICATE instead of the
usual edge-set-hash comparison: the hash test needs one extra full round
(6 shuffles) to observe "nothing changed", while the certificate reads
the just-checkpointed edges twice (2 cheap jobs).  Certificate: the edge
set is exactly a forest of min-rooted stars iff
  (a) every src has out-degree 1, and
  (b) no dst has any out-edge (all round outputs point strictly
      downward, src > dst, so an out-edge from a dst would have to go
      even lower — i.e. the dst is not a root).
Stars are a fixpoint of both star operations (large star on a star maps
every leaf back to the root; small star is the identity on it), so
stopping at the certificate yields the same output as hash-stability, one
round earlier.

Each round checkpoints to truncate lineage (SURVEY.md §7b: iterative CC
lineage blowup MUST checkpoint).  `checkpoint_dir=None` uses
`localCheckpoint` (executor-local blocks — fine in local mode, NOT safe
under executor loss); pass a reliable `checkpoint_dir` (HDFS/object
store) on a real cluster.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Target edge rows per shuffle partition inside the CC round loop.  Each
# round is ~6 tiny shuffles over the (usually small) frontier; running
# them at the session-wide shuffle width (sized for the big Arrow stages)
# makes the loop pure task-scheduling overhead — measured 8.2s → 3.3s at
# bench scale by sizing partitions to the edge count instead.
_EDGES_PER_PARTITION = 500_000

# Edge count above which the large-star output is materialized before the
# small-star step (see connected_components): below it, recomputing the
# large-star subtree once is cheaper than an extra checkpoint job per
# round; above it, the duplicated window/explode work dominates.
_INTRA_CKPT_MIN_EDGES = 100_000


def _symmetrize(edges: DataFrame, dedup: bool = False) -> DataFrame:
    """Both directions of every edge.  No distinct by default: the min
    aggregation inside _star is duplicate-insensitive and each round ends
    in its own distinct, so deduping here would just add a shuffle."""
    fwd = edges.select(F.col("src"), F.col("dst"))
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    out = fwd.union(rev).filter(F.col("src") != F.col("dst"))
    return out.distinct() if dedup else out


def _star(edges: DataFrame, large: bool, dedup: bool = True) -> DataFrame:
    """One large- or small-star step.  Symmetrizes first: every node must
    see its full undirected neighborhood, including the parent pointers
    produced by the previous step.

    Physical shape (round-6 rewrite, guide §2.4): ONE hash exchange of
    the symmetrized edges + one sort, with m = least(src, min(dst)) as a
    window over src and the per-src (src, m) parent row emitted at
    row_number()==1 — then both output kinds produced in a single
    explode pass.  The previous groupBy(src).min + self-join form paid
    two exchanges of the edge relation per star step, and — node ids
    being strings (urls) — every min(string) aggregate planned as a
    SortAggregate and the join as a SortMergeJoin: four extra sorts of
    the edge set per step.  Results are identical row-for-row (same
    emissions, same duplicate behavior under dedup=False); measured on
    the 250k-page flagship link graph (729k sym edges): CC total
    8.4 s → 4.7 s warm.

    dedup=False skips the output distinct — used after the large-star
    step, whose duplicates are harmless to the following small-star
    (min/neighborhood aggregations are duplicate-insensitive) and whose
    distinct would cost a full extra shuffle per round; the small-star
    step always dedups so the round output (and the per-round growth) is
    bounded."""
    edges = _symmetrize(edges)
    wo = Window.partitionBy("src").orderBy("dst")
    mn = F.min("dst").over(
        wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    moved = F.col("dst") > F.col("src") if large else F.col("dst") <= F.col("src")
    ann = edges.select(
        "src", "dst",
        F.least(F.col("src"), mn).alias("m"),
        F.row_number().over(wo).alias("rn"),
    )
    emitted = F.array_compact(
        F.array(
            F.when(moved, F.struct(F.col("dst").alias("src"), F.col("m").alias("dst"))),
            F.when(
                F.col("rn") == 1,
                F.struct(F.col("src").alias("src"), F.col("m").alias("dst")),
            ),
        )
    )
    out = (
        ann.select(F.explode(emitted).alias("e"))
        .select("e.src", "e.dst")
        .filter(F.col("src") != F.col("dst"))
    )
    return out.distinct() if dedup else out


def _is_star_forest(edges: DataFrame) -> bool:
    """Star certificate (see module docstring).  Two small jobs over the
    just-checkpointed edge set; every round output points strictly
    downward (src > dst), so condition (b) reduces to src∩dst = ∅.

    Deliberately NOT fused into one union+groupBy job: that variant was
    built and micro-benched (round 4, 16c, 100k-page link graph) —
    ~300 ms/round on the converged round (vs ~520 for both jobs here)
    but ~750 ms on every NON-converged round, because this form's first
    job short-circuits False the moment any src has out-degree > 1 and
    the fused aggregation always pays the doubled union input.  Over a
    multi-round run the short-circuit wins; the fusion was reverted on
    measurement."""
    deg = edges.groupBy("src").agg(F.count("*").alias("c"))
    if deg.filter(F.col("c") > 1).limit(1).count() > 0:
        return False
    srcs = edges.select(F.col("src").alias("dst")).distinct()
    return edges.join(srcs, "dst", "left_semi").limit(1).count() == 0


def connected_components(
    links: DataFrame,
    src_col: str = "url_a",
    dst_col: str = "url_b",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    round_shuffle_partitions: int | None = None,
) -> DataFrame:
    """Edge table → (node, component) with component = min node id of the
    cluster.  Nodes absent from `links` are not emitted (callers union
    singletons back; see plans/linkage.py).

    checkpoint_dir: if given, rounds use RELIABLE `checkpoint()` into it
    (survives executor loss — required on a real cluster); default is
    `localCheckpoint` (local-mode / test speed).

    round_shuffle_partitions: shuffle width for the round loop.  Default
    (None) sizes it from the ACTUAL edge count (counted on the
    just-checkpointed edge set — a cheap block scan), capped at the
    session's shuffle setting: the frontier is usually far smaller than
    the corpus the session width was tuned for, and ~6 shuffles/round ×
    oversized task counts turn the loop into scheduler overhead.  The
    session conf is restored on exit."""
    spark = links.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint_dir is not None else df.localCheckpoint()

    # No _symmetrize here: _star symmetrizes its input itself, so a
    # pre-symmetrized edge set would enter round 1 with every edge
    # duplicated (sym of sym) — the round-1 window would sort twice the
    # rows for identical output (min/neighborhood ops are
    # duplicate-insensitive).  Only the self-loop filter is kept.
    edges = ckpt(
        links.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    sess_sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_edges = edges.count()  # materialized by ckpt() — cheap block scan
    if round_shuffle_partitions is None:
        round_shuffle_partitions = max(
            8, min(sess_sp, math.ceil(n_edges / _EDGES_PER_PARTITION))
        )
    # Checkpoint BETWEEN the two star steps on big graphs: small-star
    # symmetrizes its input (union of both directions), so an
    # unmaterialized large-star subtree is otherwise computed twice —
    # once per union branch (ReusedExchange shares the exchange, but the
    # window/explode above it re-runs).  Measured (round 6): 250k-page
    # flagship graph (729k sym edges) CC 7.2 s → 5.2 s warm with the
    # intermediate materialization; on small graphs (cc_customer, 30k
    # edges) the extra per-round materialization job is pure overhead,
    # so it is gated on the measured edge count — data-proportional,
    # not a local-mode constant.
    intra_ckpt = n_edges > _INTRA_CKPT_MIN_EDGES
    spark.conf.set("spark.sql.shuffle.partitions", str(round_shuffle_partitions))
    converged = False
    try:
        for r in range(max_iter):
            large = _star(edges, large=True, dedup=False)
            if intra_ckpt:
                large = ckpt(large)
            edges = ckpt(_star(large, large=False))  # cut lineage every round
            # skip the certificate after round 1: any input that is not
            # already a star forest (i.e. any multi-hop component) needs
            # >= 2 rounds, so the round-1 certificate can only confirm
            # non-convergence — two wasted jobs per run.  A 1-round
            # input pays one extra (idempotent: stars are a fixpoint of
            # both star ops) round instead; multi-round graphs — every
            # real link graph — save the round-1 certificate.
            if r >= 1 and _is_star_forest(edges):
                converged = True
                break
        comp = edges.select(F.col("src").alias("node"), F.col("dst").alias("component"))
        roots = comp.select(F.col("component").alias("node"), F.col("component"))
        if converged:
            # the certificate just PROVED out-degree == 1 for every src
            # and that no dst ever appears as a src — so comp is already
            # one row per member node and the root set is disjoint from
            # it.  A distinct on the roots is the only dedup needed; the
            # general groupBy-min below would re-aggregate 2x the rows
            # with a string min (SortAggregate) for the same result.
            return comp.union(roots.distinct())
        return (
            comp.union(roots)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(sess_sp))

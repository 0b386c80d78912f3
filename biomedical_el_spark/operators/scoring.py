"""Stage 2 — pairwise scoring over blocked candidate pairs.

Reproduces the reference's bi-encoder scoring semantics (dot product over
dual-tower embeddings, modeling_e2e_span.py:147-173,227-232) as a batched
hybrid score (north_star):

    score = w_cos·cosine(emb_a, emb_b) + w_jac·jaccard(shingles) +
            w_jw·jaro_winkler(prefix_a, prefix_b)

All three kernels are vectorized: cosine/JW run as Arrow pandas UDFs over
[batch] numpy (similarity.py), Jaccard is a pure JVM expression.  The
γ-threshold + fallback semantics of the reference's span pruning
(run_e2e_span.py:538-540) survive as the τ match threshold, and top-1
linking (run_e2e_span.py:570-575) as `top_links`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..functions.embedder import embed_text
from ..functions.similarity import (
    cosine_expr,
    cosine_udf,
    jaccard_expr,
    jaro_winkler_udf,
)
from .pairs import salted_feature_join

DEFAULT_WEIGHTS = {"cos": 0.5, "jac": 0.35, "jw": 0.15}


def score_pairs(
    pairs: DataFrame,
    pages: DataFrame,
    weights: dict[str, float] | None = None,
    salt_buckets: int = 8,
    k_shingle: int = 3,
    jw_prefix: int = 64,
) -> DataFrame:
    """(url_a, url_b) → scored pairs (url_a, url_b, cos_sim, jac_sim,
    jw_sim, score)."""
    w = weights or DEFAULT_WEIGHTS
    feats = pages.select(
        "url",
        embed_text(F.col("text")).alias("vec"),
        X.shingles(X.tokens(X.normalize_text(F.col("text"))), k_shingle).alias("sh"),
        F.substring(F.col("text"), 1, jw_prefix).alias("prefix"),
    )
    hydrated = salted_feature_join(
        pairs, feats, salt_buckets, feature_cols=("vec", "sh", "prefix")
    )
    return hydrated.select(
        "url_a",
        "url_b",
        cosine_udf(F.col("vec_a"), F.col("vec_b")).alias("cos_sim"),
        jaccard_expr(F.col("sh_a"), F.col("sh_b")).alias("jac_sim"),
        jaro_winkler_udf(F.col("prefix_a"), F.col("prefix_b")).alias("jw_sim"),
    ).withColumn(
        "score",
        w["cos"] * F.col("cos_sim")
        + w["jac"] * F.col("jac_sim")
        + w["jw"] * F.col("jw_sim"),
    )


def match_links(scored: DataFrame, tau: float = 0.62) -> DataFrame:
    """τ-threshold → match edges (reference γ-prune semantics,
    run_e2e_span.py:538)."""
    return scored.filter(F.col("score") >= tau).select("url_a", "url_b", "score")


def top_links(scored: DataFrame, k: int = 1) -> DataFrame:
    """Per-left-record top-k partner (reference argmax top-1 linking,
    run_e2e_span.py:570-575; top-k candidates utils_e2e_span.py:426)."""
    win = Window.partitionBy("url_a").orderBy(F.desc("score"), F.asc("url_b"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def score_pairs_from_features(
    pairs: DataFrame,
    features: DataFrame,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Scale-path scorer: hydrate (url_a, url_b) from the narrow features
    table (vec + minhash sig + prefix, ~600B/row) with plain equi-joins —
    AQE skew-join splitting handles residual hot urls; `salted_feature_join`
    remains available for pathological dimensions.  Jaccard comes from the
    signature estimate (no shingle arrays shuffled)."""
    from .features import sig_jaccard_expr

    w = weights or DEFAULT_WEIGHTS
    fa = features.select(
        F.col("url").alias("url_a"), F.col("vec").alias("vec_a"),
        F.col("sig").alias("sig_a"), F.col("prefix").alias("prefix_a"),
    )
    fb = features.select(
        F.col("url").alias("url_b"), F.col("vec").alias("vec_b"),
        F.col("sig").alias("sig_b"), F.col("prefix").alias("prefix_b"),
    )
    hydrated = pairs.join(fa, "url_a").join(fb, "url_b")
    # cosine as a JVM expression: measured faster than the Arrow UDF here
    # (no python round-trip for the 64-dim dot); JW stays a batched numpy
    # UDF (no SQL equivalent)
    return hydrated.select(
        "url_a",
        "url_b",
        cosine_expr(F.col("vec_a"), F.col("vec_b")).alias("cos_sim"),
        sig_jaccard_expr(F.col("sig_a"), F.col("sig_b")).alias("jac_sim"),
        jaro_winkler_udf(F.col("prefix_a"), F.col("prefix_b")).alias("jw_sim"),
    ).withColumn(
        "score",
        w["cos"] * F.col("cos_sim")
        + w["jac"] * F.col("jac_sim")
        + w["jw"] * F.col("jw_sim"),
    )

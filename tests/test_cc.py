"""Connected components on known graphs."""

from pyspark.sql import functions as F

from biomedical_el_spark.operators.cc import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "url_a string, url_b string")
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_two_components(spark):
    comp = _cc(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert comp["a"] != comp["x"]


def test_long_chain(spark):
    # chain of 40 nodes — worst case for naive propagation; large/small star
    # must converge in O(log n) rounds within the max_iter budget
    nodes = [f"n{i:03d}" for i in range(40)]
    comp = _cc(spark, list(zip(nodes, nodes[1:])))
    assert set(comp.values()) == {"n000"}
    assert len(comp) == 40


def test_cycle_and_duplicate_edges(spark):
    comp = _cc(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "b"), ("b", "a")])
    assert set(comp.values()) == {"a"}


def test_reliable_checkpoint_option(spark, tmp_path):
    """checkpoint_dir switches rounds to reliable checkpoint() (cluster-
    safe under executor loss) with identical output."""
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, "url_a string, url_b string")
    ckdir = str(tmp_path / "cc_ck")
    rows = connected_components(df, checkpoint_dir=ckdir).collect()
    comp = {r["node"]: r["component"] for r in rows}
    assert comp == _cc(spark, edges)
    import os

    assert any(os.scandir(ckdir)), "reliable checkpoint dir never written"


def test_star_certificate_matches_hash_convergence(spark):
    """The star-certificate stop must produce the same components as
    running the stars to a generous fixed budget (hash-stability upper
    bound) on an adversarial mix: chain + cycle + star + singleton edge."""
    from biomedical_el_spark.operators.cc import _star, _symmetrize

    edges = (
        [(f"c{i}", f"c{i+1}") for i in range(9)]
        + [("r1", "r2"), ("r2", "r3"), ("r3", "r1")]
        + [("h", x) for x in ("h1", "h2", "h3", "h4")]
        + [("s1", "s2")]
    )
    df = spark.createDataFrame(edges, "url_a string, url_b string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    e = _symmetrize(df.select(F.col("url_a").alias("src"), F.col("url_b").alias("dst")))
    for _ in range(10):  # >> log2(n): guaranteed past the fixpoint
        e = _star(_star(e, large=True, dedup=False), large=False).localCheckpoint()
    comp = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = comp.select(F.col("component").alias("node"), F.col("component"))
    ref = {
        r["node"]: r["component"]
        for r in comp.union(roots)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
        .collect()
    }
    assert got == ref


def test_transitivity_invariant(spark, pages):
    """Cluster transitivity: if (a,b) and (b,c) are links then a,b,c share
    a component."""
    from biomedical_el_spark.plans.linkage import run_linkage

    out = run_linkage(spark, pages)
    links = out["links"]
    comp = out["clusters"]
    c1 = comp.select(F.col("node").alias("url_a"), F.col("component").alias("ca"))
    c2 = comp.select(F.col("node").alias("url_b"), F.col("component").alias("cb"))
    joined = links.join(c1, "url_a").join(c2, "url_b")
    assert joined.filter(F.col("ca") != F.col("cb")).count() == 0
    # every page appears exactly once
    assert comp.count() == pages.count()
    assert comp.select("node").distinct().count() == pages.count()

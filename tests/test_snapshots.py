"""Snapshot store: resume-equals-fresh-run, fingerprint invalidation,
crash consistency (no manifest ⇒ recompute)."""

import os

from pyspark.sql import functions as F

from biomedical_el_spark.datagen.pages import generate_pages
from biomedical_el_spark.plans.linkage import LinkageConfig, run_linkage
from biomedical_el_spark.sources.snapshots import SnapshotStore, fingerprint


def test_get_or_compute_skips_recompute(spark, tmp_path):
    store = SnapshotStore(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return spark.range(10).withColumn("v", F.col("id") * 2)

    fp = fingerprint({"cfg": 1})
    df1 = store.get_or_compute(spark, "s1", fp, compute)
    df2 = store.get_or_compute(spark, "s1", fp, compute)
    assert len(calls) == 1
    assert df1.count() == df2.count() == 10


def test_fingerprint_change_invalidates(spark, tmp_path):
    store = SnapshotStore(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return spark.range(5)

    store.get_or_compute(spark, "s", fingerprint(1), compute)
    store.get_or_compute(spark, "s", fingerprint(2), compute)
    assert len(calls) == 2


def test_missing_manifest_means_recompute(spark, tmp_path):
    """Crash consistency: data files without a manifest don't count as a
    committed snapshot."""
    store = SnapshotStore(str(tmp_path))
    fp = fingerprint("x")
    store.write(spark.range(3), "s", fp)
    os.remove(store._manifest_path("s"))
    assert not store.committed("s", fp)


def test_resume_equals_fresh_run(spark, tmp_path):
    """Kill-and-rerun: a run resumed over committed snapshots yields
    byte-identical links to a fresh run (north_star resumability)."""
    pages = generate_pages(spark, 200, cluster_size=4).cache()
    cfg = LinkageConfig()

    fresh = run_linkage(spark, pages, cfg=cfg)
    fresh_links = {tuple(r) for r in fresh["links"].select("url_a", "url_b").collect()}

    store = SnapshotStore(str(tmp_path / "snap"))
    first = run_linkage(spark, pages, store=store, cfg=cfg, input_fingerprint="p200")
    # simulate crash after 'scored': drop manifests for links + clusters
    for stage in ("links", "clusters"):
        p = store._manifest_path(stage)
        if os.path.exists(p):
            os.remove(p)
    resumed = run_linkage(spark, pages, store=store, cfg=cfg, input_fingerprint="p200")
    resumed_links = {
        tuple(r) for r in resumed["links"].select("url_a", "url_b").collect()
    }
    assert resumed_links == fresh_links

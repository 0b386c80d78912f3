"""spark-submit deployment shape (north_rule): the packaged zip must be
importable on its own (the --py-files contract), and the job entry point
must run end-to-end from it and RESUME from committed snapshots on
re-submit."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_submit_zip_runs_and_resumes(spark, tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_submit_zip.py")],
        check=True, capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "biomedical_el_spark.zip")
    stub = os.path.join(REPO, "dist", "linkage_submit.py")
    assert os.path.exists(zip_path) and os.path.exists(stub)

    from biomedical_el_spark.datagen.pages import generate_pages

    pages_dir = str(tmp_path / "pages")
    generate_pages(spark, 300, cluster_size=4).write.parquet(pages_dir)
    out_dir = str(tmp_path / "snapshots")

    env = dict(os.environ)
    # the package must come from the ZIP, not the repo checkout —
    # exactly what executors see under --py-files
    env["PYTHONPATH"] = zip_path
    # stand-in for spark-submit's --master (get_spark(cluster=True)
    # deliberately sets none)
    env["PYSPARK_SUBMIT_ARGS"] = "--master local[8] pyspark-shell"
    env["SPARK_DRIVER_MEM"] = "4g"
    args = [
        sys.executable, stub,
        "--input", pages_dir, "--output", out_dir,
        "--input-fingerprint", "testcorpus-v1",
    ]

    def run():
        proc = subprocess.run(
            args, env=env, capture_output=True, text=True, timeout=600,
            cwd=str(tmp_path),  # must not depend on repo-relative cwd
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        summary = json.loads(proc.stdout.strip().splitlines()[-1])
        return summary

    first = run()
    assert first["pages"] == 300
    assert first["clusters"] == 75  # 300 pages / cluster_size 4
    assert os.path.exists(os.path.join(out_dir, "clusters", "_manifest.json"))

    # re-submit: resumes from committed snapshots, identical answer
    second = run()
    assert second == first

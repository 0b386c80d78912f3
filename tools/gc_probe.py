"""GC-time share of the flagship per weak-scaling leg.

Reads the JVM's GarbageCollectorMXBeans before/after the timed region of
a pinned flagship run — quantifies how much of the hi leg's busy-time
inflation is garbage collection (a single shared JVM running 4x the task
threads in 4x the heap) versus other causes.  Writes
tools/gc_probe.json.

Usage: python tools/gc_probe.py   (runs 4c/1M and 16c/4M, ~10 min)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from biomedical_el_spark.session import get_spark
from biomedical_el_spark.plans.linkage import run_linkage, LinkageConfig

cores = int(sys.argv[1]); pages_dir = sys.argv[2]
spark = get_spark("gcprobe", cores=cores, shuffle_partitions=2 * cores)
pages = spark.read.parquet(pages_dir)
pages.count()
warm = run_linkage(spark, pages.limit(20000), cfg=LinkageConfig(num_partitions=2 * cores))
warm["clusters"].write.format("noop").mode("overwrite").save()
for df in warm.values():
    df.unpersist()


def gc_millis():
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


g0 = gc_millis()
t0 = time.time()
out = run_linkage(spark, pages, cfg=LinkageConfig())
out["clusters"].write.format("noop").mode("overwrite").save()
dt = time.time() - t0
g1 = gc_millis()
print("RESULT " + json.dumps({
    "cores": cores, "sec": round(dt, 2), "gc_sec": round((g1 - g0) / 1000, 2),
    "gc_frac_of_wall": round((g1 - g0) / 1000 / dt, 4),
}))
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.environ.get("SCALING_CORPUS_ROOT", "/tmp/scaling_corpora")
    results = {}
    for cores, n in ((4, 1_000_000), (16, 4_000_000)):
        env = dict(os.environ)
        env["SPARK_DRIVER_MEM"] = f"{6 * cores}g"
        proc = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
             RUNNER.replace("@REPO@", repo), str(cores), os.path.join(root, str(n))],
            capture_output=True, text=True, timeout=1800, env=env,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                results[f"{cores}c_{n}"] = json.loads(line[len("RESULT "):])
    with open(os.path.join(repo, "tools", "gc_probe.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

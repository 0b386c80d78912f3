"""Compose BENCH.md from measured artifacts:

  - tools/scaling_results.json  (python tools/scaling_bench.py)
  - tools/tfidf_ab.json         (python tools/tfidf_ab.py)       [optional]
  - tools/ann_recall.json       (python tools/ann_recall_bench.py) [optional]

Keeping the render separate from the measurement means a new A/B row never
forces re-running the multi-hour scaling sweep.

Usage: python tools/render_bench.py
"""

from __future__ import annotations

import json
import os


def _load(path: str) -> dict | None:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def render(report: dict, tfidf: dict | None, ann: dict | None) -> str:
    lo, hi = report["lo_cores"], report["hi_cores"]
    factor = hi // lo
    curve = report["weak_curve"]
    rows = "\n".join(
        f"| {c['base_pages']:,} → {c['base_pages']*factor:,} "
        f"| {c[f'sec_{lo}c']} | {c[f'sec_{hi}c_{factor}x']} "
        f"| {c[f'pages_per_sec_{lo}c']:,} | {c[f'pages_per_sec_{hi}c']:,} "
        f"| **{c['weak_efficiency']}** |"
        for c in curve
    )
    strong_rows = "\n".join(
        f"| {int(n):,} | {report['times'][f'{lo}c_{n}']} | {report['times'][f'{hi}c_{n}']} | **{e}** |"
        for n, e in report["strong_efficiency"].items()
    ) or "| (no overlap size) | | | |"
    biggest = curve[-1]

    doc = f"""# BENCH — flagship linkage throughput & scaling efficiency

North-rule evidence: the same end-to-end linkage job (read parquet →
feature UDF → LSH blocking → pair generation → fused hybrid scoring →
τ links → large-star/small-star connected components → noop sink) at two
parallelism levels — the in-sandbox stand-in for N vs 4N executors.
Deterministic synthetic Common-Crawl-shaped corpus (datagen/pages.py,
cluster_size=4, known gold clusters).  Reproduce:
`python tools/scaling_bench.py` then `python tools/render_bench.py`;
`python bench.py` is the per-round driver bench.

## Methodology

Each point runs in its own fresh JVM **pinned with `taskset` to exactly N
physical cores** (32-core VM, 1 thread/core), so JVM task threads, Python
UDF workers, GC and shuffle threads share N cores — the budget of an
N-core executor host.  An untimed full-pipeline warm-up precedes the
timed run (python-worker spin-up + codegen are executor *startup* costs,
amortized on any long-lived cluster).  Engine time excludes datagen and
session startup; best-of-3 repeats (best-of-2 for >1M-page points) — the
least-noise estimator on this shared host (see control below).

## Weak-scaling curve ({lo}→{hi} cores, {factor}× data — the N→4N stand-in)

The north rule's criterion is throughput efficiency ≥0.8 from N to 4N
executors serving proportionally more data — weak scaling.  Fixed
driver-side costs (stage-boundary scheduling gaps, the CC round loop's
job-submission overhead) are constant seconds per job, so their share of
wall time falls as stages grow; the curve below measures exactly that
amortization:

| corpus ({lo}c → {hi}c) | T({lo}c) s | T({hi}c, {factor}×) s | pages/s ({lo}c) | pages/s ({hi}c) | weak eff |
|---|---|---|---|---|---|
{rows}

**Largest point ({biggest['base_pages']:,}→{biggest['base_pages']*factor:,} pages): weak efficiency {biggest['weak_efficiency']}** (target ≥ 0.8 — not met
in-sandbox; see the controls below for why the ceiling here is ~0.5–0.6
and what portion is host, not engine).

Round-3 measurement notes, in the open: the curve did NOT converge
monotonically — the 250k point benefits from best-of-3 luck on a day
with 1.65× per-vCPU spread (every point in this table was measured in
one session; round 2's quieter host gave 0.507 at the 1M point vs 0.419
today).  Two real fairness bugs in the harness WERE found and fixed this
round, each worth real seconds: (a) the {hi}c/{biggest['base_pages']*factor//1000000}M leg previously ran
4× the data in a heap that had only doubled — heap now scales at
6 GB/core, and (b) task width was fixed at 2×cores regardless of volume,
making 16M-page tasks multi-minute straggler targets — the feature stage
now sizes ~50k pages/task (LinkageConfig.num_partitions).  Together:
{hi}c/16M 1561s → 1197s (−23%).  A third hypothesis — young-gen pressure
scaling with allocation threads — was A/B'd (Xmn8g vs 2g at {hi}c/16M:
1365s vs 1197s) and rejected.  (The 16c/16M figure is a single clean
measurement — the harness hit a full disk during its second repeat;
best-of could only have improved it.)

## Strong scaling (same input, {lo}→{hi} cores)

| corpus | T({lo}c) s | T({hi}c) s | strong eff |
|---|---|---|---|
{strong_rows}

Strong scaling on a shared-vCPU host is the harder gate (the {hi}-core
leg hits the noisy-vCPU lottery ~{factor}× more often per stage barrier);
the north rule's production shape — more executors, more data — is the
weak curve above.

## Round-over-round (same protocol, different host days)

| point | round 2 | round 3 | note |
|---|---|---|---|
| 4c/1M best s | 128.43 | 142.88 | host spin spread 1.346× → 1.653× |
| 16c/1M best s | 70.62 | 66.8 | |
| 16c/4M best s | 253.21 | 340.66 | |
| 16c/16M best s | — | 1197.36 | new largest point (1561s before the round-3 heap/partition fairness fixes) |
| weak eff @1M | 0.507 | 0.419 | noise-dominated delta |

## Host-noise control (why these numbers have a hard in-sandbox ceiling)

Per-vCPU spin control measured at run time: individual vCPUs of this
shared-host VM stochastically run up to **{report['vcpu_spin_spread_max_over_min']}× slower** than
their neighbors (1–2 of 16 at any instant; the slow set moves around).  A
barrier-synchronized engine waits for its slowest task at every stage
boundary, so per-stage wall time is gated by the slowest vCPU in the
allocation — a ceiling independent of engine quality that binds the
{hi}-core leg ~{factor}× more often than the {lo}-core leg.  Independent
(barrier-free) compute kernels measured 0.81–1.06 weak-scaling on the
same box; task-occupancy traces show the engine keeps all {hi} cores busy
whenever tasks are runnable.  On a real fleet with dedicated cores this
control is ~1.0 and the barrier penalty vanishes.

## Occupancy evidence (what the remaining gap is made of)

Task-occupancy traces (statusTracker sampled at 4 Hz during a 16-core
run): whenever tasks are runnable the engine runs **16–17 concurrently**
(full allocation); the inefficiency is (a) wall time with zero runnable
tasks — driver-side stage boundaries, concentrated in the CC round
loop — and (b) barrier waits on stochastically slow vCPUs (control
above).  Both shrink with scale: stage-boundary seconds are independent
of data volume (at 10^12 pages each stage runs minutes, not seconds),
and dedicated-core fleets don't have the vCPU lottery.  The per-stage
compute kernels (embedding+minhash featurization, fused scoring) measure
0.81–1.06 weak-scaling when run barrier-free on this same box.
"""

    if tfidf:
        b, t = tfidf["base"], tfidf["tfidf"]
        doc += f"""
## TF-IDF blocking channel A/B (flagship, {tfidf['n_pages']:,} pages, 16 cores)

`LinkageConfig.use_tfidf_blocks` adds a rare-shingle recall channel
(reference `--use_tfidf_candidates`).  Measured head-to-head, fresh
pinned JVM per arm:

| arm | wall s | candidate pairs | candidate recall | precision | recall | F1 |
|---|---|---|---|---|---|---|
| minhash+embedding (default) | {b['sec']} | {b['n_pairs']:,} | {b['blocking_recall']} | {b['precision']} | {b['recall']} | {b['f1']} |
| + tfidf channel | {t['sec']} | {t['n_pairs']:,} | {t['blocking_recall']} | {t['precision']} | {t['recall']} | {t['f1']} |

**Decision: {tfidf['decision']}** — on this corpus (near-dup clusters,
intra-cluster Jaccard ≈0.7) MinHash banding already reaches candidate
recall {b['blocking_recall']}, so the extra channel buys
{round(t['blocking_recall']-b['blocking_recall'], 6)} recall for
{round(t['sec']-b['sec'], 1)}s (+{round(100*(t['sec']/b['sec']-1))}%) —
default stays off; enable it for corpora with low-Jaccard duplicates
sharing distinctive phrases (the recall-delta unit test constructs
exactly that shape and shows the channel catching pairs banding misses).
"""

    if ann:
        rows = "\n".join(
            f"| {v['variant']} | {v['sec']} | {v['candidate_pairs']:,} | {v['recall_at_5']} |"
            for v in ann["variants"]
        )
        doc += f"""
## ANN recall@5 vs cost ({ann['n_queries']}×{ann['n_vectors']:,} vectors, near-random embeddings — adversarial for LSH)

Brute force is the reference yardstick (recall 1.0 by construction,
`utils_e2e_span.py:417-426`); the LSH variants are the 100-TB scale path
(bucket equi-join, never all-pairs).  Cost = candidate pairs actually
scored:

| variant | wall s | candidate pairs | recall@5 |
|---|---|---|---|
{rows}

Multi-probe (own bucket + all single-bit-flip neighbor buckets) trades
{ann['probe_cost_ratio']}× the candidates of single-probe for
{ann['recall_gain']}× the recall — still {ann['brute_cost_ratio']}× fewer
comparisons than brute force.  IVF-flat (deterministic sampled coarse
centroids, nprobe=2) sits between the two LSH points on both axes —
a different recall/cost dial (nlist/nprobe vs planes/probes).  On easy
(clustered) embeddings all variants converge to recall ≈1; this fixture
is the worst case.
"""

    doc += """
## Correctness at these settings

Pairwise F1 vs generator truth: **1.0** at the 600-page verify shape
(precision 1.0).  At 1M pages (TF-IDF A/B run above): precision **1.0**,
UNconditioned recall 0.972 / F1 0.986 — unconditioned recall counts gold
pairs that no blocking channel covers and that the block-size cap
evicts, so it is bounded below the north gate by design.  The north
metric itself is *conditioned on shared blocking keys* (BASELINE.json:
'at fixed blocking keys'); that conditioned gate (≥ 0.99, plus the
unconditioned variant at test shape) is asserted in
tests/test_pipeline.py.
"""
    return doc


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tools = os.path.join(repo, "tools")
    report = _load(os.path.join(tools, "scaling_results.json"))
    if report is None:
        raise SystemExit("run tools/scaling_bench.py first (no scaling_results.json)")
    doc = render(
        report,
        _load(os.path.join(tools, "tfidf_ab.json")),
        _load(os.path.join(tools, "ann_recall.json")),
    )
    with open(os.path.join(repo, "BENCH.md"), "w") as f:
        f.write(doc)
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()

"""Plan hygiene audit: print the physical plans of representative catalog
queries and grep them for the properties that matter at 100 TB —
PushedFilters reaching the parquet scan, broadcast joins on small dims,
whole-stage codegen coverage.  Writes PLANS.md.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")

CHECKS = {
    # map-side partial aggregation (partial_*) before the exchange and
    # pushed filters at the scan are the two properties that decide
    # whether a plan survives a 100× scale-up
    "q1_pricing_summary": ["PushedFilters: \\[IsNotNull|PushedFilters: \\[.*LessThan", "partial_"],
    "q3_order_revenue": ["BroadcastHashJoin", "partial_"],
    "p_filter_project": ["PushedFilters: \\[.*(GreaterThan|IsNotNull)"],
    "ann_cosine_topk": ["BroadcastNestedLoopJoin|BroadcastHashJoin|CartesianProduct"],
    "w_running_total": ["Window"],
    "er_exact_dedup": ["partial_count", "partial_min"],
    "er_minhash_blocks": ["partial_min", "Generate explode"],
    # tfidf channel: df computed with map-side partial count, then a
    # shuffle-key equi-join back on shingle, then the per-url top-w window
    "er_tfidf_blocks": ["partial_count", "Window"],
    # scale-path ANN: the bucket join must be an equi hash join, never a
    # cartesian/broadcast-nested-loop
    "ann_lsh_topk": ["ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin"],
    # multi-probe: query side explodes to 1+num_planes probe keys, and the
    # candidate join must STAY an equi-join over the probe key
    "ann_multiprobe_topk": [
        "ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin",
        "Generate explode",
    ],
    # BIO decode: window + map-side partial aggregate, ONE exchange on
    # doc_id shared by both (no second shuffle for the groupBy)
    "w_bio_decode": ["Window", "partial_"],
    # IVF: centroid assignment is a BROADCAST product (tiny centroid
    # list), the candidate retrieval an equi-join on cell id
    "ann_ivf_topk": [
        "BroadcastNestedLoopJoin",
        "ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin",
    ],
    # k-means IVF: Lloyd assignment is broadcast × partial-aggregated
    # struct-max (map-side combine, NO vectors through the exchange);
    # search hydration is id-keyed equi-joins
    "ann_ivf_kmeans_topk": [
        "BroadcastNestedLoopJoin",
        "partial_max",
        "ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin",
    ],
    # capped pair-gen: sizes pass partial-aggregates (count,min) before
    # its exchange; oversized keys leave via a small-side anti-join
    "er_capped_star_pairs": ["partial_count", "partial_min", "LeftAnti"],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from biomedical_el_spark.plans import catalog
    from biomedical_el_spark.session import get_spark

    import re

    spark = get_spark("explain-audit", cores=8, shuffle_partitions=8)
    out = ["# PLANS — physical-plan audit of representative operators\n"]
    ok_all = True
    for name, needles in CHECKS.items():
        df = catalog.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
            df.explain()  # simple mode: *(n) marks whole-stage codegen
        plan = buf.getvalue().replace("*(", "WholeStageCodegen(")
        out.append(f"\n## {name}\n")
        for needle in needles:
            hit = bool(re.search(needle, plan))
            ok_all &= hit
            out.append(f"- `{needle}`: {'present' if hit else 'MISSING'}")
            print(f"{name}: {needle} -> {'ok' if hit else 'MISSING'}")
        # keep the scan lines as evidence
        scan_lines = [
            l.strip() for l in plan.splitlines()
            if "PushedFilters" in l or "ReadSchema" in l
        ][:4]
        if scan_lines:
            out.append("\n```")
            out.extend(scan_lines)
            out.append("```")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md", "ALL OK" if ok_all else "(some properties missing)")


if __name__ == "__main__":
    main()

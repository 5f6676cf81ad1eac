"""Whole-registry physical-plan audit: build EVERY registry query's
plan and scan `.explain("formatted")` for the operators that kill
100 TB runs:

- ``CartesianProduct``        — an unconditioned cross join (always a bug)
- ``BroadcastNestedLoopJoin`` — legitimate ONLY when the broadcast side
  is a bounded one-row/tiny-aggregate relation (the engine's documented
  crossJoin-of-a-scalar pattern); every occurrence must be allowlisted
  with a justification below, so a NEW unbounded BNLJ fails the audit
- ``BatchEvalPython``         — a row-at-a-time Python UDF in the plan
  (the engine's Python surface is Arrow-only: pandas_udf / mapInPandas
  / applyInPandas, which plan as ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas)

Exit code 1 on any unallowlisted hit. SortAggregate occurrences are
reported as information only (some are inherent: ObjectHashAggregate
fallbacks for min/max over strings in tiny final stages).

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001 — plan
shapes, not timings, so the smallest lake is the right input)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x17a5_spark.queries import registry  # noqa: E402
from x17a5_spark.session import get_spark  # noqa: E402

# query -> why its BroadcastNestedLoopJoin is bounded (build side is a
# broadcast of ONE row or a constant-size relation, never
# data-proportional). EXACTLY the queries that plan a BNLJ today — a
# stale entry would mask a future unbounded BNLJ, so when a query stops
# planning one, REMOVE its row (the audit does not verify allowlist
# liveness; keep it tight by hand).
BNLJ_ALLOWED = {
    "g2_triangle_count": "final crossJoin of the one-row triangle count",
    "j15_churn_absence": "crossJoin(broadcast(one-row min/max span aggregate))",
    "s1_cosine_topk": (
        "brute-force baseline BY DESIGN: bounded N_QUERIES query-vector "
        "set broadcast against candidates (q_id != c_id non-equi)"
    ),
    "t15_heavy_hitters": "one-row corpus-total broadcast on a lit key",
    "t24_bigram_perplexity": "one-row LM-normalizer broadcast on a lit key",
    "t25_keyword_extraction": "one-row doc-count broadcast on a lit key",
    "a17_sample_quantiles": "one-row bottom-k sample-bound broadcast",
    "a26_ks_test": (
        "one-row reference-count broadcast + bounded ref-sample x "
        "per-source-list cross (both sides constant-bounded)"
    ),
    "d12_temperature_mix": "one-row corpus-totals broadcast x #sources rows",
    "t13_perplexity_filter": "one-row unigram-LM normalizer broadcast",
    "t14_bm25_search": "one-row corpus avgdl/N scalar broadcast",
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()
    hits: dict[str, list[str]] = {"cartesian": [], "bnlj": [], "py_udf": []}
    sort_aggs: list[str] = []
    failures: list[str] = []
    for name, fn in queries.items():
        try:
            df = fn(spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {e}")
            continue
        if "CartesianProduct" in txt:
            hits["cartesian"].append(name)
        if "BroadcastNestedLoopJoin" in txt and name not in BNLJ_ALLOWED:
            hits["bnlj"].append(name)
        if "BatchEvalPython" in txt:
            hits["py_udf"].append(name)
        if "SortAggregate" in txt:
            sort_aggs.append(name)
        spark.catalog.clearCache()
    print(f"\naudited {len(queries)} plans at {sf}")
    print("SortAggregate (informational):", sorted(sort_aggs) or "none")
    print("plan-build failures:", failures or "none")
    bad = False
    for flag, names in hits.items():
        if names:
            bad = True
            print(f"RED FLAG {flag}: {sorted(names)}")
    if failures:
        bad = True
    if bad:
        sys.exit(1)
    print("PASS (no cartesians, no unallowlisted BNLJ, no row-at-a-time Python UDFs)")


if __name__ == "__main__":
    main()

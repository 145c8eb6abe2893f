"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "runs": {...}, "reps": R, "sf": ...}

Methodology (round-4 change): each query is executed ``REPS`` times
(default 3) and ``queries[name]`` reports the MIN across reps, with
the full per-rep list under ``runs[name]``. A single cold shot per
query — the old scheme — cannot distinguish a real 2x regression
from this sandbox's I/O scheduling variance (observed 1.5-6x swings
on identical code between rounds); min-of-N is robust to one-sided
noise because interference only ever adds time. Caches are cleared
between reps so the min is still the query's own cost, not a
residual-cache artifact; a warm-up query runs first so JVM/codegen
warm-up isn't billed to the first headline query. Execution is via a
noop sink — full computation without driver result serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

# Headline set: one per workload family (scan+transform, star join,
# TPC-H Q1 agg, window, event-time window, dedup/text/vector extensions).
HEADLINE = [
    "q_flagship_season_rollup",
    "q_derived_metrics",
    "q_groupby_agg",
    "q_star_join_agg",
    "q_window_rank",
    "q_tumbling_window_agg",
]
# Extension queries are included when registered (phase 3+).
OPTIONAL = [
    "q_session_window",
    "q_dedup_exact",
    "q_corpus_curation",
    "q_text_stats",
    "q_token_topk",
    "q_doc_fingerprint",
    "q_similarity_topk",
    "q_ann_ivf_topk",
    "q_minhash_near_dup",
    "q_multimodal_features",
    # statistics / TPC-H / training-data families (round 1 widening)
    "q_stats_moments",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_window_dist",
    "q_bpe_token_count",
    "q_embedding_quantize",
    # round 2: consolidated fidelity + re-blocked near-dup families
    "q_fidelity_datetime",
    "q_simhash_near_dup",
    "q_ngram_jaccard",
    "q_embedding_near_dup",
    "q_ann_lsh_topk",
    "q_salted_agg",
    # round 2 widening: sketches, layout keys, time-series, graph
    "q_cms_heavy_hitters",
    "q_bloom_semi_join",
    "q_gap_fill_interpolate",
    "q_pagerank",
    # round 2: repetition rule, deterministic HLL
    "q_repetition_filter",
    "q_hll_distinct",
    # round 4: consolidated certification suites + fuzzy entity join
    "q_olap_suite",
    "q_stats_suite",
    "q_fuzzy_join",
    # round 4: batch-vs-corpus admission + benchmark decontamination
    "q_incremental_dedup",
    "q_decontaminate",
    # round 4: event analytics + mixture sampling
    "q_funnel",
    "q_retention",
    "q_source_mixture",
]


def main() -> None:
    from weatherflow_spark.session import get_spark
    from weatherflow_spark.plans import QUERIES

    spark = get_spark(app_name="weatherflow-bench", master=f"local[{CPUS}]")

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        elapsed = round(time.perf_counter() - t0, 3)
        # Queries that persist loop-invariant relations (near-dup
        # signatures, pagerank edges) would otherwise accumulate
        # cache across reps — drop it so every timing is the query's
        # own cost and memory pressure stays flat.
        spark.catalog.clearCache()
        return elapsed

    # warm-up (JVM + parquet footer caches), not billed
    QUERIES["q_flagship_season_rollup"](spark, SF_DIR).count()

    names = HEADLINE + [n for n in OPTIONAL if n in QUERIES]
    runs = {name: [run_once(name) for _ in range(REPS)] for name in names}
    timings = {name: min(reps) for name, reps in runs.items()}
    total = round(sum(timings.values()), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "reps": REPS,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "total_headline_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}``

Queries are executed with the ``noop`` sink so timing covers the full
distributed plan (scan → shuffle → agg) without driver-side collect cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lambda_kafka_to_s3_parquet_spark import get_spark
from lambda_kafka_to_s3_parquet_spark.plans import all_specs

#: Headline set: at least one per operator family (relational scans/joins/
#: windows/rollup/json/array, §2.9 dedup/similarity/text/multimodal,
#: event-time windows, ingest decode) so regressions anywhere are visible.
HEADLINE = [
    # relational read-back surface
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_nation_revenue",
    "q06_revenue_forecast",
    # round 4: q07 consolidates former q29 (adds the ntile-quartile branch);
    # its timing is not comparable to rounds <= 3.
    "q07_top_customers_per_nation",
    "q08_running_totals",  # incl. former q28 lag-gap in the same Window node
    "q09_distinct_agg",
    "q10_grouping_sets",  # ROLLUP + CUBE (former q10_rollup + q22_cube)
    "q15_json_extract",
    "q16_array_stats",
    # q21 round-3 "regression" (1.41 -> 2.09 s) did not reproduce: 5
    # isolated runs at sf0.1 steady-state at 1.39-1.52 s (= round 2), so it
    # was shared-host load on both of round 3's two runs. runs_per_query
    # now defaults to 3 to make min() robust against exactly that.
    "q21_percentiles",
    "q24_salted_join",  # round 4: salted-join timing tracked per-round
    "q26_outer_joins",
    "q30_subqueries",
    # LLM-pipeline extensions
    "x01_exact_dedup_docs",
    "x02_cdc_latest_event",
    "x03_token_stats",
    "x07_minhash_neardup",
    "x08_simhash",
    "x10_embedding_topk",
    "x12_embedding_neardup_blocked",
    "x13_media_stats",
    "x17_frame_sample",
    "x19_asof_join",
    "x20_interval_join",
    "x21_split_and_pack",
    "x22_rollup_daily",
    "x24_dup_clusters",
    "x25_decontaminate",
    "x26_boilerplate_lines",
    "x27_pii_redact",
    "x28_curation_chain",  # round 4: end-to-end curation pipeline
    # event-time windows + stateful streaming
    "w01_tumbling_window",
    "w02_sliding_window",  # round 4: overlap-factor-2 window tracked per-round
    "w03_session_window",
    "w05_stateful_user_profiles",
    # ingest decode (golden fixture replay; constant size)
    "i01_replay_decode",
    # synthesized 20k-record Confluent batch through the full decode stage
    "i06_decode_throughput",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="lk2sp-bench")
    specs = all_specs()

    # JVM/codegen warmup outside the timed region.
    from lambda_kafka_to_s3_parquet_spark.session import load_table

    load_table(spark, sf_dir, "lineitem").count()

    # Three executions per query, min taken: single-shot numbers on a shared
    # host swing several x with neighbor load (round 3's q21 "regression"
    # was two co-loaded runs), so the min needs >= 3 samples to be the
    # reproducible cost of the plan. Recorded in the JSON so rounds compare
    # like-for-like.
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in specs:
            continue
        best = None
        for _ in range(runs_per_query):
            df = specs[name].fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": runs_per_query,
        "agg": "min",
    }))
    spark.stop()


if __name__ == "__main__":
    main()

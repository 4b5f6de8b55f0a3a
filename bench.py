"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "total_headline_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "queries_small": {...}, "sf_small": 0.01, "scale_ratio": {...}}``

Queries are executed with the ``noop`` sink so timing covers the full
distributed plan (scan → shuffle → agg) without driver-side collect cost.

Scale slope (round 5): the same headline set also runs at a 10× smaller
scale factor in the same invocation, and ``scale_ratio`` records
t(sf)/t(sf_small) per query — turning the per-operator "rides the scan" /
"cost ∝ batch" claims into measured slopes. Reading the ratios:

* each timing carries a fixed per-query floor (plan build, task launch,
  JVM round-trips — ~0.05–0.15 s on this host), so cheap queries sit well
  below the data ratio even when perfectly linear;
* ratio ≈ data ratio (10) → scan/shuffle-bound and linear; noticeably
  ABOVE it → superlinear — a scale smell worth a plan audit;
* i01/i06 replay constant-size golden/synthesized fixtures and the w0x
  streaming queries pay constant micro-batch machinery — their ratios
  hover near 1 by design and say nothing about data scaling.
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
    # round 11: q01 absorbs former q06_revenue_forecast as its
    # '_Q6'/'forecast' row — q01 timing includes both scans, not
    # comparable to rounds <= 10 on either name. The freed oracle slot
    # promoted w15 (already a headline entry).
    "q01_pricing_summary",
    # round 5 (late): q03 consolidates former q05_nation_revenue (adds the
    # 5-way star-join branch); its timing is not comparable to earlier
    # rounds. Same for q04 (absorbs q18's derived-aggregate joins) and
    # q16 (absorbs q14's date/string scalar families).
    "q03_shipping_priority",
    # round 4: q07 consolidates former q29 (adds the ntile-quartile branch);
    # its timing is not comparable to rounds <= 3.
    "q07_top_customers_per_nation",
    "q08_running_totals",  # incl. former q28 lag-gap in the same Window node
    "q09_distinct_agg",
    "q10_grouping_sets",  # ROLLUP + CUBE (former q10_rollup + q22_cube)
    # round 5: q16 consolidates former q15_json_extract (adds the JSON
    # branch); its timing is not comparable to rounds <= 4.
    "q16_array_stats",
    # round 7: q16 also absorbs former q21_percentiles (pct branch) —
    # q16 timing is not comparable to rounds <= 6. (q21's round-3
    # "regression" was shared-host load; runs_per_query=3 guards that.)
    # round 11: q26 absorbs former q24_salted_join as its
    # 'salted_segments' branch — q26 timing includes the salted shuffle
    # join, not comparable to rounds <= 10 on either name. The freed
    # oracle slot promoted x44, which joins the headline below.
    "q26_outer_joins",
    "q30_subqueries",
    # LLM-pipeline extensions
    # round 13: x01 absorbs former w06_stream_dedup as its union-tagged
    # 'stream' branch (the checkpointed duplicated-replay dedup stream
    # runs INSIDE x01's fn) — x01 moves to SINGLE_RUN and its timing is
    # the old w06's streaming cost plus the cheap batch branch; not
    # comparable to rounds <= 12 on either name. The freed oracle slot
    # promoted w12 (below). x13 likewise absorbs former x14's decode-stub
    # feature census as its 'features' branch (one more mapInPandas pass
    # — not comparable to rounds <= 12).
    "x01_exact_dedup_docs",
    # round 11: x02 absorbs former w10 as its union-tagged 'stream'
    # branch (the maintained CDC current-state replay now runs INSIDE
    # x02's fn) — x02 moves to SINGLE_RUN and its timing is the old
    # w10's streaming cost plus the cheap batch branch; not comparable
    # to rounds <= 10 on either name. The freed oracle slot promoted
    # w14, which joins the headline below.
    "x02_cdc_latest_event",
    # round 9: x03 union-tagged (absorbs x33's bigram heavy hitters) —
    # timing not comparable to rounds <= 8. Round 11: also absorbs
    # x52's count-min 'cms' branch (sketch build + probe inside the
    # query) — not comparable to rounds <= 10. The freed oracle slot
    # promoted x53, which joins the headline below.
    "x03_token_stats",
    # round 11 (late): x07 absorbs former x06_fingerprints as its three
    # union-tagged fingerprint branches (md5_norm/rabin_karp/simhash run
    # INSIDE x07's fn) — x07 timing is the pair pipeline plus the
    # fingerprint censuses, not comparable to rounds <= 10 on either
    # name. The freed oracle slot promoted x55 (below).
    "x07_minhash_neardup",
    # round 8: x08_simhash consolidated into x06; its bench slot goes to
    # the new substring-granular dedup (positioned-gram census + island
    # merge — a heavier, more representative near-dup workload)
    "x51_duplicated_spans",
    # round 11: x10 absorbs former x12_embedding_neardup_blocked as its
    # union-tagged 'neardup' branch — x10 timing is the sum of both GEMM
    # passes, not comparable to rounds <= 10 on either name. The freed
    # oracle slot promoted x49. Round 14: also absorbs former
    # x53_int8_topk as the 'int8' branch (quantize + localCheckpoint +
    # int8 GEMM inside fn() — EAGER_FN) — not comparable to <= 13.
    "x10_embedding_topk",
    # round 9: x17_frame_sample consolidated into x13 (union-tagged
    # 'frames' branch) — x13 timing not comparable to rounds <= 8; the
    # freed oracle slot went to x50's appended-index census
    "x13_media_stats",
    # round 6: real-codec image pipeline (PPM encode -> thumbnail ->
    # features through three Arrow stages)
    "x46_image_pipeline",
    # round 9: x20_interval_join consolidated into x19 (union-tagged
    # 'interval' branch) — x19 timing not comparable to rounds <= 8; the
    # freed oracle slot went to x34's deterministic skip census
    "x19_temporal_joins",
    "x21_split_and_pack",
    # round 10: x22_rollup_daily consolidated into w08 (union-tagged
    # 'batch' branch) — w08 timing not comparable to rounds <= 9; the
    # freed oracle slot went to w11's enrichment oracle. The batch
    # rollup's scale slope stays visible via stress.py, which calls the
    # unregistered x22 function directly.
    # x24/x28 rounds <= 4 numbers (0.11 s / 0.66 s) understated the real
    # cost: clock-after-fn timing missed work, and min-of-3 re-built
    # byte-identical logical plans so later runs hit run 1's in-memory
    # cache. Round 5's CC correctness fix (localCheckpoint of the edge
    # list) moved that work INSIDE fn(), so both are now in EAGER_FN and
    # report the honest ~2.5-4 s cold cost of candidate-gen + verify +
    # label propagation at sf0.1 — not comparable to earlier rounds.
    "x24_dup_clusters",
    # round 6: x25 registers the df-CAPPED decontamination call (the
    # measured quadratic-blowup guard is now the default the registry
    # teaches); timing is not comparable to rounds <= 5 (the uncapped
    # call pays no census shuffle).
    "x25_decontaminate",
    # round 6: semantic cross-split decontamination (blocked GEMM)
    "x49_semantic_decontaminate",
    "x27_pii_redact",
    # round 6: x28 absorbs former x26_boilerplate_lines as a union-tagged
    # branch — its timing now includes that census and is not comparable
    # to rounds <= 5. Round 9: x28 switches to curate_with_audit and adds
    # the per-document drop-ledger branches (gate_drop/dup_drop). The
    # audit itself is ~free (same-host min-of-3: audited 7.2 s vs
    # unaudited 7.5 s warm; the single-pass CASE form, not a branch
    # union); x28's round-over-round delta is host drift — the old shape
    # re-measured 7.5-7.9 s on the round-9 host that benched it at 4.5
    # in r7. Not comparable to rounds <= 8.
    "x28_curation_chain",  # round 4: end-to-end curation pipeline
    # deterministic stratified corpus mix (round 5: oracle-checked)
    "x30_stratified_mix",
    # round 7: oracle-promoted (deterministic hyperplane cells)
    "x31_semantic_dedup",
    # one-pass per-column profile (round 5)
    "x36_data_profile",
    # round 11: x21 absorbs former x38_doc_chunking as its 'chunk'
    # branch (x21 timing adds the chunk census — not comparable to
    # rounds <= 10); the freed oracle slot promoted w13. URL/domain cap
    # and unigram-LM scoring stay below.
    # round 9: x39 union-tagged (doc_cap + token_quota cumsum branch) —
    # timing not comparable to rounds <= 8
    "x39_domain_cap",
    "x40_lm_perplexity",
    # round 11 (late): DSIR importance resampling — target/raw unigram
    # LMs (Dirichlet target smoothing) -> Gumbel-top-k selection census
    "x55_dsir_select",
    # round 5 (late): PQ ANN — trains codebooks + encodes inside fn()
    # (EAGER_FN). Round 9: union-tagged 'pq' + 'ivfpq' branches (the
    # IVF-PQ composition trains cells AND codebooks inside fn()) — not
    # comparable to rounds <= 8.
    "x41_pq_ann",
    # round 14: x53 folded into x10's 'int8' branch in the REGISTRY (its
    # oracle slot went to w09), but the bench artifact never removes a
    # key — the standalone function still exists and is timed here.
    # COMPARABILITY: x53 has been in EAGER_FN since it joined in r11
    # (the quantize+localCheckpoint always ran inside fn() under the
    # before-fn clock), so its series is comparable ACROSS ALL ROUNDS
    # 11+; the r13→r14 0.42→0.60 s delta is host noise on a sub-second
    # key, not a clock change (r14's contrary note was wrong — the r14
    # diff shows x53 already in the EAGER_FN set before it).
    "x53_int8_topk",
    # round 5 (late): hybrid BM25 + PRF-dense RRF fusion (EAGER_FN: the
    # PRF centroid collect runs inside fn())
    "x42_hybrid_rrf",
    # round 5 (late): constraint-validation report (fused row checks +
    # uniqueness + referential integrity + skew diagnosis)
    "x43_data_quality",
    # round 5 (late): BPE merge learning — a driver loop of vocab-sized
    # jobs runs inside fn() (SINGLE_RUN: fixed machinery dominates)
    "x45_bpe_vocab",
    # round 6: the tokenizer-to-trainer chain — learn BPE (batched
    # rounds), encode the corpus to id sequences, pack fixed 512-token
    # training rows (SINGLE_RUN: the same driver merge loop runs inside)
    "x48_pack_training_rows",
    # MLlib linear quality probe (round 5; min-of-3 EAGER_FN since
    # round 8 — see EAGER_FN note)
    "x37_quality_model",
    # event-time windows + stateful streaming
    # round 5: w01 consolidates former w02_sliding_window (union-tagged
    # sliding branch); its timing is not comparable to rounds <= 4.
    # round 9: w03_session_window consolidated into w01 (union-tagged
    # 'session' branch) — w01 timing not comparable to rounds <= 8; the
    # freed oracle slot went to x52's count-min census
    "w01_tumbling_window",
    "w05_stateful_user_profiles",
    # round 5: the full stateful streaming surface, now oracle-checked —
    # each runs a real checkpointed streaming query (file-source replay),
    # so these carry constant micro-batch machinery on top of data cost.
    # Adding them widens the headline total vs rounds <= 4.
    # (round 13: w06 folded into x01's 'stream' branch — see x01 note)
    "w07_stream_stream_join",
    "w08_incremental_rollup",
    # round 5: incremental near-dup dedup vs the signature store (real
    # checkpointed stream over a perturbed-twin replay; single-run like
    # the other streaming entries). Round 6: the store became the
    # partitioned two-part band store (bands + id-bucketed sigs) whose
    # per-batch cost is ~flat in corpus size (stress.py w09 row: 1.0x at
    # 10x store); at fixture scale that trades ~2x wall for the extra
    # partitioned writes + pruned-read sync points, so w09's timing is
    # not comparable to rounds <= 5 (which rescanned and re-banded the
    # whole store every batch -- cheap only while the store is tiny).
    "w09_incremental_neardup",
    # round 5: per-batch stream enrichment from the maintained CDC state
    # (w10's slot: the CDC upsert replay itself now runs inside x02's
    # 'stream' branch — see the x02 note above)
    "w11_stream_enrichment",
    # round 7: streaming semantic decontamination vs persisted test index
    "w12_semantic_decontam_stream",
    # round 8: streaming duplicated-span scrub vs the persisted
    # gram-census store (bloom negative-lookup + registered appends;
    # fixture capped at 300 docs + twins, so the entry measures the
    # per-batch machinery, not corpus scale)
    "w13_span_scrub_stream",
    # round 11: streaming per-domain token quota (oracle-promoted this
    # round; two-batch stateful replay — fixed micro-batch machinery)
    "w14_token_quota_stream",
    # round 10: streaming BM25 index maintenance (build + two exactly-
    # once appends + an indexed query; fixed micro-batch machinery)
    "w15_bm25_index_stream",
    # round 10 (late): snapshot change-data surface — keyed diff across a
    # compaction + the exactly-once incremental consumer (scratch
    # snapshot tables; side-effecting, so single-run like the streams)
    "x54_change_feed",
    # round 11 (late): the snapshot-protocol census joined the headline
    # when q24→q26 freed its oracle slot (append/overwrite/time-travel/
    # rollback + zone-map dir pruning; scratch tables — single-run)
    "x44_snapshot_table",
    # ingest decode (golden fixture replay; constant size)
    "i01_replay_decode",
    # synthesized 20k-record Confluent batch through the full decode stage
    "i06_decode_throughput",
    # round 5: same batch with TWO writer versions mixed — i09 minus i06
    # is the measured price of the per-record schema-version dispatch
    "i09_decode_throughput_mixed",
]


#: Round-12 (warm-up protocol ACTIVE — SINGLE_RUN min-of-2, VERDICT
#: r11 Next #2): total 131.57 s, and the immediate same-host repeat
#: read 132.04 s — 0.4% apart, the "within ~10% of a repeated run"
#: done-criterion met with margin; BENCH_r12 should finally be
#: thermally comparable round-over-round.
#:
#: HOST-STEAL caveat measured the same day: three later runs of
#: near-identical code read 177.0 / 176.9 / 187.9 s with queries
#: UNTOUCHED since round 11 (q08, q10) inflating 1.4-1.7x alongside
#: everything else (median 1.1-1.15x, erratically up to 3x on
#: driver-roundtrip-heavy streams — different victims each run), while
#: /proc/stat showed ~9.6k CPU-seconds of cumulative steal and vmstat
#: st=1 at idle. The warm-up protocol removes THERMAL noise; hypervisor
#: steal it cannot — when BENCH_rN lands >30% above BENCH_local's
#: committed numbers with this uniform-inflation signature, read it as
#: the shared-host weather, not a regression (the r9/r10/r11 precedent,
#: now with the steal counter attached). The +16 s vs r11's WARM
#: 115.0 is new surface: x44 grew its conditional-merge branch
#: (+~1 s), x19 its funnel time-to-convert percentiles, x46 its
#: container transcode (all four codecs now run in the pipeline),
#: x42 absorbed x32's branch; like-for-like streaming keys IMPROVED
#: vs the committed r11 artifact (w07 5.2 -> 3.9, x02 7.1 -> 5.2,
#: w06 4.6 -> 3.8 — the warm-up eating the cold-JVM inflation).
#:
#: Round-11 final (idle host, warm run of 2; the first run directly
#: after the 22-min suite read 139 s — cold-JVM inflation, the
#: round-9 lesson): total 115.0 s (batch 44.0, fixed 71.0). The
#: +15 s vs round 10's 99.7 is NEW SURFACE, not regression: x44
#: joined the headline (5.9 s snapshot census incl. the delete
#: branch), w14 joined (2.3 s), x53 joined (0.4 s), x02 absorbed
#: w10's full streaming replay (0.14 -> 5.7 s; the standalone w10 key
#: is gone), x54 grew its IVM 'view' branch (3.9 -> 5.7 s), and FIVE
#: standalone keys (q06/q24/x12/x38/x52) folded into their hosts
#: (q01/q26/x10/x21/x03 each grew by roughly the folded query's
#: cost — x03 additionally moved to EAGER_FN because the cms branch's
#: sketch build runs inside fn(): its ~1.9 s is the first HONEST
#: number for that shape, not comparable to the 0.4-0.5 s
#: clock-after-fn readings of rounds <= 10). x45 1.4-1.5 s
#: re-confirms the r10 3.02 s was host drift (bpe.py untouched).
#:
#: Round-11 re-measure (idle host, 3 back-to-back reps, clearCache
#: between runs — the round-9 protocol): x45 1.5-1.7 s, w08 5.9-6.5 s.
#: Verdict-r10 watch items resolved: x45's r10 reading of 3.02 s (vs
#: r9's 1.25) was HOST DRIFT — bpe.py is untouched since r9 and the
#: same code measures 1.5-1.7 s tonight; no refactor warranted. w08's
#: 4.58 -> 5.72 r9->r10 delta is the absorbed x22 'batch' branch (a
#: second bounded rollup write/read inside the query) plus streaming
#: noise — tonight's 5.9-6.5 s bracket confirms r10's number was real
#: for the folded shape, not a regression of the stream path.
#: Round-9 artifact notes (idle host, per the bench-protocol rule; the
#: round-8 artifact was committed from a noisy night and every SINGLE_RUN
#: streaming entry read +9-38% vs r7): this run puts w05-w12 back within
#: +12% of their r7 values and x42 at ~1.6 s, confirming the r8 inflation
#: was measurement. w13 3.74 s (r8 4.17) reflects the delta-bloom +
#: cached-read-plan work (see STRESS_r09 w13 rows: fresh/dup 1.0x at a
#: 10x store). x13/x19 absorb former x17/x20 (not comparable to <= r8).
#: Residual watch: x46 crept 0.64 (r7) -> 0.82 (r8) -> 0.97 s with no
#: change on its own path; the round-8 BMP codec added a format-dispatch
#: branch in front of the PPM decode it exercises — small absolute cost,
#: attribute before optimizing.
#: Checkpointed streaming replays (w05-w10) execute a full multi-micro-
#: batch query per invocation: their cost is dominated by fixed machinery
#: (scratch copy, checkpoint commits, state-store files), stable run-to-
#: run relative to its ~5-10 s magnitude, so min-of-3 would triple bench
#: wall time to shave noise that is a rounding error at this scale. They
#: run once; the batch queries keep the min-of-N protocol.
SINGLE_RUN = {
    # x45: a driver loop of 15 vocab-sized merge rounds — fixed machinery
    # dominates like the streaming replays; single run, clock before fn()
    "x45_bpe_vocab",
    "w05_stateful_user_profiles",
    "w09_incremental_neardup",
    # round 11: x02 carries the former w10 streaming replay inside
    "x02_cdc_latest_event",
    # round 13: x01 carries the former w06 streaming replay inside
    "x01_exact_dedup_docs",
    "w11_stream_enrichment",
    "w12_semantic_decontam_stream",
    "w13_span_scrub_stream",
    "w14_token_quota_stream",
    "w15_bm25_index_stream",
    "x54_change_feed",
    "x44_snapshot_table",
    "w07_stream_stream_join",
    "w08_incremental_rollup",
}

#: Batch queries whose fn() executes real work EAGERLY while building the
#: plan (localCheckpoint-materialized CC rounds in x24/x28, the LM-totals
#: action in x40): clock-after-fn would time only the residual noop write.
#: They keep min-of-N but start the clock before fn().
EAGER_FN = {
    # round 8: x37 moved here FROM SINGLE_RUN — "fixed L-BFGS machinery,
    # stable run-to-run" did not survive contact with shared-host noise
    # (observed 16.7 s in a bench run whose standalone min-of-3 is
    # ~5.2 s); min-of-3 with the clock before fn() (the fit runs inside)
    # is the honest protocol. Not comparable to rounds <= 7 single-run
    # numbers when those caught a noise burst.
    "x37_quality_model",
    # round 8: x48 likewise — its single-run number swung 2.6-6.3 s
    # across rounds purely with JVM/session warmth; the driver merge
    # loop runs inside fn(), so clock-before-fn + min-of-3 (warm floor
    # ~3.2 s at sf0.1). Not comparable to earlier single-run rounds.
    "x48_pack_training_rows",
    "x24_dup_clusters",
    "x28_curation_chain",
    "x40_lm_perplexity",
    "x41_pq_ann",
    "x42_hybrid_rrf",
    # round 14: x10's absorbed int8 branch quantizes + localCheckpoints
    # inside fn() — clock before fn(). x53 itself has been here since
    # r11 (verified against the r11 diff — the r14 comment claiming
    # rounds 11-13 clocked x53 after fn() was wrong); its r13→r14 delta
    # is plain noise on a 0.4-0.6 s key, not a protocol change.
    "x10_embedding_topk",
    "x53_int8_topk",
    # round 11: x03's absorbed cms branch builds + localCheckpoints the
    # count-min sketch inside fn() — clock must start before it
    "x03_token_stats",
    # round 11 (late): x19's absorbed funnel branch collects its k-row
    # step counts and the resample branches localCheckpoint the bucket
    # aggregate inside fn() — clock before fn() or that work is
    # invisible. Not comparable to earlier rounds (also grew 4 branches).
    "x19_temporal_joins",
}


def _sf_of(sf_dir: str) -> float | None:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else None


def _steal_cpu_s() -> float | None:
    """Cumulative hypervisor STEAL time (CPU-seconds across all cores,
    /proc/stat field 9 of the aggregate cpu line) — the one counter that
    distinguishes shared-host weather from a real regression. The
    round-12 artifact read 245.5 s for 131.6 s of quiet-window work and
    the adjudication needed git archaeology plus a judge re-run; with
    per-phase steal deltas IN the artifact, a polluted phase is
    identifiable from the JSON alone (VERDICT r12 Next #2)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        if parts and parts[0] == "cpu" and len(parts) > 8:
            return int(parts[8]) / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError):
        pass
    return None


def _load1() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return None


#: a timed run is POLLUTED when hypervisor steal during it exceeds this
#: fraction of its wall x core budget (5% of the machine stolen): the
#: reading measures the neighbor, not the plan — re-run once, keep min
_STEAL_FRACTION = 0.05
_NCPU = os.cpu_count() or 1

#: second rerun trigger (round 14, VERDICT r13 What's-wrong #2): a query
#: reading more than this multiple of its own sf0.01 sibling — while ANY
#: steal was recorded on it — gets one bonus run too. The all-polluted
#: rule alone missed r13's x24 (41.3 CPU-s of steal spread over runs
#: that were each individually under the 5% bar, min 8.03 s vs a 2.36 s
#: sibling and an untouched plan); the sibling ratio is the artifact's
#: own cross-check that survives partial pollution. 3x is calibrated to
#: the committed artifacts: the headline's honest sf0.1/sf0.01 slopes
#: sit at 1-2.5 (fixed machinery + sublinear scans dominate at these
#: sizes), so >3 with nonzero steal is weather until proven otherwise —
#: and the bonus run costs one sample, bounded once per query.
_SIBLING_RATIO = 3.0


def _time_set(
    spark,
    specs,
    sf_dir: str,
    runs_per_query: int,
    single_runs: int = 1,
    sibling: dict[str, float] | None = None,
) -> tuple[dict[str, float], dict]:
    """``single_runs`` > 1 re-executes the SINGLE_RUN queries (streaming
    replays, the snapshot protocol exercise) and takes the min — their
    first execution at a scale factor pays JIT/state-store/class-load
    warm-up that the round-11 artifact showed is ~20% of the reading
    (BENCH_r11 cold 139.5 s vs same-host warm 115.0 s). The batch
    queries already get this from min-of-N.

    Weather-aware (round 13): each query's hypervisor-steal delta is
    recorded, and a query whose EVERY timed run was polluted (steal
    > ``_STEAL_FRACTION`` of its wall x cores) gets ONE bonus run —
    min-of-N only removes noise when at least one sample was clean.
    Returns ``(timings, weather)`` where weather carries the phase's
    steal/load deltas plus the per-query steal map."""
    timings: dict[str, float] = {}
    qsteal: dict[str, float] = {}
    reran: list[str] = []
    phase_steal0, phase_load0 = _steal_cpu_s(), _load1()
    for name in HEADLINE:
        if name not in specs:
            continue
        best = None
        steal_q = 0.0
        all_polluted = True
        n_runs = single_runs if name in SINGLE_RUN else runs_per_query
        run = 0
        while run < n_runs:
            run += 1
            s0 = _steal_cpu_s()
            # Streaming replays (SINGLE_RUN) and eager plan-builders
            # (EAGER_FN) execute work inside fn() — the clock must start
            # before fn() or most of their cost is invisible. LAZY batch
            # queries keep the rounds-1-4 protocol (clock starts once the
            # plan is built, timing the distributed execution):
            # driver-side analysis of the big union-tagged/HOF plans
            # costs 0.2-0.5 s, which is per-query noise at bench scale
            # and amortized at 100 TB — including it made half the batch
            # surface read as regressed in the round-5 preview when
            # execution was flat.
            if name in SINGLE_RUN or name in EAGER_FN:
                t0 = time.perf_counter()
                df = specs[name].fn(spark, sf_dir)
            else:
                df = specs[name].fn(spark, sf_dir)
                t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            s1 = _steal_cpu_s()
            ds = (s1 - s0) if (s0 is not None and s1 is not None) else None
            if ds is not None:
                steal_q += ds
                if ds <= _STEAL_FRACTION * dt * _NCPU:
                    all_polluted = False
            else:
                all_polluted = False  # no counter: nothing to act on
            if run == n_runs and all_polluted and name not in reran:
                # every sample was stolen-from; one bonus sample —
                # bounded (once per query), recorded in the artifact
                reran.append(name)
                n_runs += 1
            if (
                run == n_runs
                and name not in reran
                and sibling is not None
                and sibling.get(name)
                and best > _SIBLING_RATIO * sibling[name]
                and steal_q > 0
            ):
                # partially-polluted case: the min still reads >3x the
                # sf0.01 sibling with steal on the books — one bonus
                # sample, same bound and artifact field
                reran.append(name)
                n_runs += 1
        timings[name] = round(best, 3)
        if steal_q >= 0.05:
            qsteal[name] = round(steal_q, 2)
        # Queries that persist an internal stage boundary (x28's cleaning
        # cache) would otherwise accumulate executor memory across the
        # 3-runs × 2-scale-factors of a bench invocation; each timed run
        # rebuilds its plan anyway, so dropping blocks between queries
        # costs nothing and keeps runs independent.
        spark.catalog.clearCache()
    phase_steal1, phase_load1 = _steal_cpu_s(), _load1()
    weather = {
        "steal_cpu_s": (
            round(phase_steal1 - phase_steal0, 2)
            if phase_steal0 is not None and phase_steal1 is not None
            else None
        ),
        "load1": [phase_load0, phase_load1],
        "steal_per_query": qsteal,
        "polluted_reruns": reran,
    }
    return timings, weather


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_small_dir = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")

    spark = get_spark(app_name="lk2sp-bench")
    specs = dict(all_specs())
    # x53 left the registry in round 14 (folded into x10's 'int8' branch
    # to free the oracle slot that promoted w09) but bench keys are
    # append-only: time the surviving standalone function under its own
    # key so BENCH_rN stays a superset of BENCH_r13.
    from lambda_kafka_to_s3_parquet_spark.plans import QuerySpec
    from lambda_kafka_to_s3_parquet_spark.plans.extensions import x53_int8_topk

    specs["x53_int8_topk"] = QuerySpec(
        "x53_int8_topk", x53_int8_topk, None,
        "bench-only key (registry fold r14: x10 'int8' branch)",
    )

    # JVM/codegen warmup outside the timed region.
    from lambda_kafka_to_s3_parquet_spark.session import load_table

    load_table(spark, sf_dir, "lineitem").count()

    # Three executions per query, min taken: single-shot numbers on a shared
    # host swing several x with neighbor load (round 3's q21 "regression"
    # was two co-loaded runs), so the min needs >= 3 samples to be the
    # reproducible cost of the plan. Recorded in the JSON so rounds compare
    # like-for-like.
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    # Small scale factor first: it doubles as codegen warmup for the big
    # pass, the same way round <= 4 used the lineitem count alone.
    small: dict[str, float] = {}
    small_weather: dict = {}
    if os.path.isdir(sf_small_dir) and sf_small_dir != sf_dir:
        small, small_weather = _time_set(
            spark, specs, sf_small_dir, runs_per_query
        )
    # SINGLE_RUN queries take min-of-2 at the TARGET sf: the first run is
    # the discarded warm-up (VERDICT r11: the committed cold reading sat
    # 21% above the same-host warm number purely from JVM thermal state,
    # polluting round-over-round comparison). The small pass keeps 1 —
    # it is itself warm-up and its numbers only feed scale_ratio.
    single_runs = int(os.environ.get("SPARK_GRAFT_BENCH_SINGLE_RUNS", "2"))
    timings, weather = _time_set(
        spark, specs, sf_dir, runs_per_query, single_runs, sibling=small
    )

    ratios = {
        n: round(timings[n] / small[n], 1) for n in timings if small.get(n)
    }
    # Split totals: the SINGLE_RUN queries (streaming replays + the
    # model-training and tokenizer-learning probes) carry per-invocation fixed machinery
    # (micro-batch commits, state stores, L-BFGS) that dwarfs their data
    # cost at bench scale — folding them into one number would make
    # round-over-round comparison vs rounds <= 4 (which benched only w05
    # of them) read as a regression when the batch engine is
    # flat-or-faster. "value" stays the honest total; "value_batch" is
    # the like-for-like scan/shuffle/agg surface.
    fixed_cost = SINGLE_RUN
    batch_total = round(
        sum(v for n, v in timings.items() if n not in fixed_cost), 3
    )
    # The PRINTED line must fit entirely inside the driver's ~2 kB stdout
    # tail window or the parse fails (rounds 5-9 all recorded
    # "parsed": null — round 8's reorder saved the queries dict visually
    # but the line head with {"metric": ... was still cut off). So the
    # stdout line carries ONLY the sf0.1 queries dict and the headline
    # totals (~1.5 kB); the sf0.01 `queries_small` and `scale_ratio`
    # maps live exclusively in BENCH_local.json, committed per round.
    out = {
        "metric": "total_headline_sec",
        "unit": "sec",
        "sf": _sf_of(sf_dir),
        "runs_per_query": runs_per_query,
        "runs_single": single_runs,
        # self-describing thermal state: every timed number had at least
        # one discarded same-process warm-up execution before it (the
        # small-sf pass for batch, min-of-runs_single for SINGLE_RUN)
        "warmup": single_runs > 1,
        "agg": "min",
        # self-describing WEATHER (r12 Next #2): hypervisor steal during
        # the big-sf phase in CPU-seconds + 1-min loadavg at its start/
        # end. A polluted artifact shows steal comparable to value x
        # cores; a quiet one shows ~0. Queries whose every sample was
        # polluted were re-run once (n below); per-query steal lives in
        # BENCH_local.json.
        "steal_cpu_s": weather["steal_cpu_s"],
        "load1": weather["load1"],
        "polluted_reruns": len(weather["polluted_reruns"]),
        # per-query steal (big-sf phase, CPU-s; only queries >= 0.05) IN
        # the printed line (VERDICT r14 Next #8): per-query weather is
        # adjudicable from the JSON alone. Additions-only; dropped FIRST
        # if the line outgrows the tail budget (queries survive longer).
        "steal_per_query": weather["steal_per_query"],
        "queries": timings,
        "value_batch": batch_total,
        "value_fixed_cost": round(
            sum(v for n, v in timings.items() if n in fixed_cost), 3
        ),
        "value": round(sum(timings.values()), 3),
    }
    line = json.dumps(out, separators=(",", ":"))
    # Guard the tail-window budget AT BENCH TIME: the queries dict grows
    # every round (r10 added w15+x54), and an oversized line reproduces
    # the rounds-5-9 silent "parsed": null failures. 1900 bytes leaves
    # ~100 B of slack inside the ~2 kB tail. Degrade loudly + parseably:
    # drop per-query keys from the PRINTED line (totals survive; the full
    # dict always lives in BENCH_local.json) and say so on stderr.
    _TAIL_BUDGET = 1900
    if len(line) > _TAIL_BUDGET:
        # degrade in two stages: steal_per_query is the newest addition
        # and lives in BENCH_local.json regardless — drop it before
        # touching the per-query timings the round-over-round comparison
        # needs (a heavily polluted run is exactly when the map is big).
        slim1 = {k: v for k, v in out.items() if k != "steal_per_query"}
        slim1["steal_per_query_truncated_to_fit_tail"] = len(
            out["steal_per_query"]
        )
        line = json.dumps(slim1, separators=(",", ":"))
        print(
            f"WARNING: bench line exceeded the {_TAIL_BUDGET} B tail "
            "budget; steal_per_query dropped from stdout (see "
            "BENCH_local.json)",
            file=sys.stderr, flush=True,
        )
    if len(line) > _TAIL_BUDGET:
        slim = {k: v for k, v in out.items()
                if k not in ("queries", "steal_per_query")}
        slim["queries_truncated_to_fit_tail"] = len(out["queries"])
        line = json.dumps(slim, separators=(",", ":"))
        print(
            f"WARNING: bench line exceeded the {_TAIL_BUDGET} B tail budget; "
            "per-query timings dropped from stdout (see BENCH_local.json)",
            file=sys.stderr, flush=True,
        )
        assert len(line) <= _TAIL_BUDGET, "even the slim bench line overflows"
    full = dict(out)
    full["weather"] = weather
    if small:
        full |= {
            "sf_small": _sf_of(sf_small_dir),
            "queries_small": small,
            "scale_ratio": ratios,
            "weather_small": small_weather,
        }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_local.json"), "w") as f:
        f.write(json.dumps(full) + "\n")
    # The JSON line must be the LAST thing on stdout/stderr: the driver
    # records a bounded tail, and round 8 lost the whole line to an async
    # StateStore-maintenance WARN stacktrace that fired after spark.stop().
    # Silence the JVM root logger entirely, stop the session, and only
    # then print — nothing can log over the line afterwards.
    try:
        spark.sparkContext.setLogLevel("OFF")
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setRootLevel(
            jvm.org.apache.logging.log4j.Level.OFF
        )
    except Exception:
        pass
    spark.stop()
    print(line, flush=True)


if __name__ == "__main__":
    main()

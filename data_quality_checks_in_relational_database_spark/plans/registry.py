"""Query registry: name → (Spark callable, DuckDB oracle SQL, bench flag).

``__spark_entry__.py`` re-exports :func:`queries` / :func:`oracle_sql`
from here; ``bench.py`` runs the ``headline`` subset. EVERY registered
query carries a DuckDB oracle twin (iterative ops via recursive-CTE or
unrolled-round replays; approximate ANN ops are registered in gated
forms whose contract IS exact); production-tuned approximate settings
live as library operators pinned by deterministic pytests plus
driver-checked recall-floor queries.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from data_quality_checks_in_relational_database_spark.plans import extension_queries as xq
from data_quality_checks_in_relational_database_spark.plans import pipeline_queries as pq
from data_quality_checks_in_relational_database_spark.plans import reference_queries as rq
from data_quality_checks_in_relational_database_spark.plans import sql_surface_queries as sq
from data_quality_checks_in_relational_database_spark.plans import survival_queries as vq
from data_quality_checks_in_relational_database_spark.plans import attribution_queries as aq
from data_quality_checks_in_relational_database_spark.plans import classifier_queries as cq
from data_quality_checks_in_relational_database_spark.plans import fusion_queries as fq
from data_quality_checks_in_relational_database_spark.plans import graph_queries as gq
from data_quality_checks_in_relational_database_spark.plans import linalg_queries as lq
from data_quality_checks_in_relational_database_spark.plans import curation_queries as uq
from data_quality_checks_in_relational_database_spark.plans import regression_queries as rg
from data_quality_checks_in_relational_database_spark.plans import tpch_shapes as th
from data_quality_checks_in_relational_database_spark.plans import scale_queries as sc
from data_quality_checks_in_relational_database_spark.plans import round7_queries as r7q
from data_quality_checks_in_relational_database_spark.plans import round8_queries as r8q

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    headline: bool = False


REGISTRY: dict[str, QuerySpec] = {
    # --- the five reference check primitives (SURVEY §2.8) ---
    "volume_audit": QuerySpec(rq.q_volume_audit, rq.ORACLE_VOLUME_AUDIT, headline=True),
    "volume_by_status": QuerySpec(rq.q_volume_by_status, rq.ORACLE_VOLUME_BY_STATUS),
    "freshness_audit": QuerySpec(rq.q_freshness_audit, rq.ORACLE_FRESHNESS_AUDIT, headline=True),
    "consistency_score": QuerySpec(
        rq.q_consistency_score, rq.ORACLE_CONSISTENCY_SCORE, headline=True
    ),
    "reconciliation": QuerySpec(rq.q_reconciliation, rq.ORACLE_RECONCILIATION, headline=True),
    "fanout_volume": QuerySpec(rq.q_fanout_volume, rq.ORACLE_FANOUT_VOLUME, headline=True),
    # --- SQL analytics surface ---
    "pricing_summary": QuerySpec(rq.q_pricing_summary, rq.ORACLE_PRICING_SUMMARY, headline=True),
    "revenue_by_nation": QuerySpec(
        rq.q_revenue_by_nation, rq.ORACLE_REVENUE_BY_NATION, headline=True
    ),
    "top_orders_per_status": QuerySpec(
        rq.q_top_orders_per_status, rq.ORACLE_TOP_ORDERS_PER_STATUS
    ),
    "orphan_lineitems": QuerySpec(rq.q_orphan_lineitems, rq.ORACLE_ORPHAN_LINEITEMS),
    # --- text analysis (north-star extensions) ---
    "text_quality": QuerySpec(xq.q_text_quality, xq.ORACLE_TEXT_QUALITY, headline=True),
    "lang_detect": QuerySpec(xq.q_lang_detect, xq.ORACLE_LANG_DETECT),
    "doc_fingerprint": QuerySpec(xq.q_doc_fingerprint, xq.ORACLE_DOC_FINGERPRINT),
    "token_budget": QuerySpec(xq.q_token_budget, xq.ORACLE_TOKEN_BUDGET),
    # --- dedup family ---
    "dedup_exact": QuerySpec(xq.q_dedup_exact, xq.ORACLE_DEDUP_EXACT, headline=True),
    # exact all-pairs baseline: correctness oracle, NOT a headline —
    # the scale path for fuzzy dedup is minhash_dedup below
    "ngram_jaccard_pairs": QuerySpec(xq.q_ngram_jaccard_pairs, xq.ORACLE_NGRAM_JACCARD),
    # asymmetric containment (subset/quote detection Jaccard misses)
    "containment_pairs": QuerySpec(xq.q_containment_pairs, xq.ORACLE_CONTAINMENT_PAIRS),
    # MinHash-LSH emits exact-Jaccard-VERIFIED pairs, so whenever banding
    # recall is 1.0 at the threshold (pytest-pinned) its output equals
    # the exact inverted-index baseline — same oracle, hash-checked
    "minhash_dedup": QuerySpec(xq.q_minhash_dedup, xq.ORACLE_NGRAM_JACCARD, headline=True),
    # prefix-filtering candidate join (Bayardo/Chaudhuri all-pairs):
    # LOSSLESS by construction -> shares the exact-pair oracle with no
    # recall pin needed; third physical path under one oracle
    # r5: t=0.7 + PPJoin positional filter cut it 36 s → 5.5 s median
    # at sf0.1 (own t=0.7 oracle). DOCUMENTED DECISION: still not a
    # headline — the synthetic corpus's small vocabulary makes even
    # rarest-prefix shingles common (100k candidates for 256 real
    # pairs), so minhash_dedup (1.34 s, same output) stays the bench
    # path; prefix filtering is registered for its lossless-candidates
    # contract, driver-gated at sf0.01
    "jaccard_prefix_filter": QuerySpec(
        xq.q_jaccard_prefix_filter, xq.ORACLE_NGRAM_JACCARD_T07
    ),
    # registered with the engine-portable md5_60 hash → the whole
    # sketch is value-checked; xxhash64 production path pytest-pinned
    "simhash_pairs": QuerySpec(xq.q_simhash_pairs, xq.ORACLE_SIMHASH_PAIRS),
    "winnowing_fingerprint": QuerySpec(xq.q_winnowing_fingerprint, xq.ORACLE_WINNOWING),
    # pairs -> connected components -> representatives (iterative; the
    # oracle closes the exact-pair graph with a recursive CTE)
    "dedup_clusters": QuerySpec(xq.q_dedup_clusters, xq.ORACLE_DEDUP_CLUSTERS, headline=True),
    # same report through the large/small-star components engine (the
    # O(log^2 n) adversarial-graph path) -> same oracle; a divergence
    # isolates a components bug
    "dedup_clusters_star": QuerySpec(xq.q_dedup_clusters_star, xq.ORACLE_DEDUP_CLUSTERS),
    # log2 histogram of dup-family sizes (template-flood release gate)
    "dedup_cluster_histogram": QuerySpec(
        xq.q_dedup_cluster_histogram, xq.ORACLE_DEDUP_CLUSTER_HISTOGRAM
    ),
    "top_terms": QuerySpec(xq.q_top_terms, xq.ORACLE_TOP_TERMS),
    "repetition": QuerySpec(xq.q_repetition, xq.ORACLE_REPETITION),
    "drift_psi": QuerySpec(xq.q_drift_psi, xq.ORACLE_DRIFT_PSI),
    # eval-set n-gram overlap (GPT-3-style decontamination recipe)
    "decontam": QuerySpec(xq.q_decontam, xq.ORACLE_DECONTAM),
    # bloom-prefilter scale path; exact verify -> same oracle
    "decontam_bloom": QuerySpec(xq.q_decontam_bloom, xq.ORACLE_DECONTAM),
    # PII/policy regex scan (portable Java∩RE2 pattern subset)
    "pii_scan": QuerySpec(xq.q_pii_scan, xq.ORACLE_PII_SCAN),
    # batch twin of the stateful streaming dedup ledger (stream ≡ batch
    # pinned in tests/test_streaming.py)
    "events_dup_ledger": QuerySpec(xq.q_events_dup_ledger, xq.ORACLE_EVENTS_DUP_LEDGER),
    # CCNet-style sub-document ("paragraph") dedup report
    "span_dedup": QuerySpec(xq.q_span_dedup, xq.ORACLE_SPAN_DEDUP),
    # bucketed range self-join (equi-join on time buckets, never the
    # O(n^2) theta join the oracle runs)
    "close_event_pairs": QuerySpec(
        xq.q_close_event_pairs, xq.ORACLE_CLOSE_EVENT_PAIRS, headline=True
    ),
    # sweep-line twin (points -> [t, t+delta] interval overlap), same oracle
    "close_event_pairs_sweep": QuerySpec(
        xq.q_close_event_pairs_sweep, xq.ORACLE_CLOSE_EVENT_PAIRS
    ),
    # per-decile QQ drift (where the distribution moved)
    "qq_drift": QuerySpec(xq.q_qq_drift, xq.ORACLE_QQ_DRIFT),
    # blocked edit-distance record linkage
    # blocked 2-key baseline — demoted from headline in r5 (measured
    # quadratic at 3× data, SCALING.md); the family headline is now the
    # O(n·w) sorted_neighborhood path below, with fuzzy_parts_keyed as
    # the re-keyed-blocks remedy demo
    "fuzzy_parts": QuerySpec(xq.q_fuzzy_parts, xq.ORACLE_FUZZY_PARTS),
    "fuzzy_parts_keyed": QuerySpec(
        xq.q_fuzzy_parts_keyed, xq.ORACLE_FUZZY_PARTS_KEYED
    ),
    # multi-pass blocking union (recall repair for block-key typos)
    "fuzzy_parts_multipass": QuerySpec(
        xq.q_fuzzy_parts_multipass, xq.ORACLE_FUZZY_PARTS_MULTIPASS
    ),
    # Jaro-Winkler linkage (transposition-tolerant twin; Arrow-batched
    # JW pinned ≡ DuckDB's implementation in pytest)
    "jw_part_linkage": QuerySpec(xq.q_jw_part_linkage, xq.ORACLE_JW_PART_LINKAGE),
    # re-keyed BASELINE-with-contract (demoted r6: the 7,500-key block
    # space saturates — 4.63× wall at 3×; any fixed key eventually
    # does. The JW family headline is jw_part_linkage_snm below.)
    "jw_part_linkage_keyed": QuerySpec(
        xq.q_jw_part_linkage_keyed, xq.ORACLE_JW_PART_LINKAGE_KEYED
    ),
    # JW over sorted-neighborhood candidates — JW family HEADLINE (r6):
    # O(n·w) candidates with no key assumption; the Arrow JW stage
    # scores a linear pair count at any corpus size (r5 verdict #3)
    "jw_part_linkage_snm": QuerySpec(
        xq.q_jw_part_linkage_snm, xq.ORACLE_JW_PART_LINKAGE_SNM, headline=True
    ),
    # sorted-neighborhood linkage: O(n log n + n·w) when no bounded
    # blocking key exists; two-phase rank + bucketed equi-join proven
    # ≡ the logical sliding window by the oracle. HEADLINE for the
    # linkage family since r5 (the scale-safe path).
    "sorted_neighborhood": QuerySpec(
        xq.q_sorted_neighborhood, xq.ORACLE_SORTED_NEIGHBORHOOD, headline=True
    ),
    # multi-pass SNM (name + reversed-name sort keys): the recall
    # repair for single-key SNM's early-typo blind spot; additive
    # O(n·w) per pass, no saturation budget needed (r6)
    "sorted_neighborhood_multikey": QuerySpec(
        xq.q_sorted_neighborhood_multikey, xq.ORACLE_SORTED_NEIGHBORHOOD_MULTIKEY
    ),
    # blocking-key cost audit (pre-flight pair-count estimator — the
    # automated check for SCALING.md's fuzzy_parts finding)
    "blocking_audit": QuerySpec(xq.q_blocking_audit, xq.ORACLE_BLOCKING_AUDIT),
    # greedy per-(user,type) debounce — sequential kept-chain scan;
    # recursive-CTE oracle steps each chain one event per iteration
    "debounce_events": QuerySpec(xq.q_debounce_events, xq.ORACLE_DEBOUNCE_EVENTS),
    # chi-square independence cells (exact integer numerators, one
    # unrounded division) — classical-test twin of weekend_drift
    "chi2_weekend_drift": QuerySpec(
        xq.q_chi2_weekend_drift, xq.ORACLE_CHI2_WEEKEND_DRIFT
    ),
    # Benford first-digit DQ check (log10-free digit extraction)
    "benford": QuerySpec(xq.q_benford, xq.ORACLE_BENFORD),
    # exact-percentile token budgeting (broadcast thresholds, no
    # single-partition ntile window)
    "token_quartiles": QuerySpec(xq.q_token_quartiles, xq.ORACLE_TOKEN_QUARTILES),
    # --- similarity search ---
    "cosine_topk": QuerySpec(xq.q_cosine_topk, xq.ORACLE_COSINE_TOPK, headline=True),
    # matryoshka truncation audit: exact top-10 by full-dim vs
    # prefix-16-dim cosine — overlap + integer micro-unit drift; the
    # "can we serve truncated vectors" deployment gate (r6)
    "matryoshka_audit": QuerySpec(
        xq.q_matryoshka_audit, xq.ORACLE_MATRYOSHKA_AUDIT
    ),
    # ann_topk_* are registered in their GATED forms (pruning disabled →
    # output must EQUAL exact top-k, hash-checked), exercising the full
    # ANN machinery — signatures/centroids, probe masking, blocked BLAS
    # scoring, global top-k. The production-pruning settings stay as
    # library operators (similarity.ann_topk_lsh/ann_topk_ivf) whose
    # recall is pinned both in pytest AND by the driver-checked
    # ann_*_recall floor queries below.
    "ann_topk_lsh": QuerySpec(xq.q_ann_lsh_full_probe, xq.ORACLE_COSINE_TOPK),
    "ann_topk_ivf": QuerySpec(xq.q_ann_ivf_full_probe, xq.ORACLE_COSINE_TOPK, headline=True),
    # full-probe variants disable pruning → must EQUAL exact top-k
    "ann_ivf_full_probe": QuerySpec(xq.q_ann_ivf_full_probe, xq.ORACLE_COSINE_TOPK),
    "ann_lsh_full_probe": QuerySpec(xq.q_ann_lsh_full_probe, xq.ORACLE_COSINE_TOPK),
    # recall floor at the production probe setting: red iff recall drifts
    "ann_ivf_recall": QuerySpec(xq.q_ann_ivf_recall, xq.ORACLE_ANN_IVF_RECALL),
    "ann_lsh_recall": QuerySpec(xq.q_ann_lsh_recall, xq.ORACLE_ANN_IVF_RECALL),
    # fixed-n-per-stratum md5-order sample (renamed in r5: the key
    # "stratified_sample" now names the Hamilton-allocation proportional
    # sampler below; this older fixed-quota form was silently shadowed
    # by the duplicate dict key until the rename)
    "stratified_fixed_n": QuerySpec(xq.q_stratified_sample, xq.ORACLE_STRATIFIED_SAMPLE),
    "cosine_neardup": QuerySpec(xq.q_cosine_neardup, xq.ORACLE_COSINE_NEARDUP),
    # signature-blocked scale path; same oracle as the brute-force pairs
    "lsh_neardup": QuerySpec(xq.q_lsh_neardup, xq.ORACLE_COSINE_NEARDUP),
    # --- multimodal plumbing ---
    "media_features": QuerySpec(xq.q_media_features, xq.ORACLE_MEDIA_FEATURES),
    # binary-payload exact dedup (md5 shuffle, bytes never move)
    "media_dedup": QuerySpec(xq.q_media_dedup, xq.ORACLE_MEDIA_DEDUP),
    # REAL stdlib PNG decode gate (encode->decode round trip; oracle
    # replays the generating arithmetic — r4, closes the decode stub)
    "media_png_decode": QuerySpec(xq.q_media_png_decode, xq.ORACLE_MEDIA_PNG_DECODE),
    # JPEG frame-header probe (segment walk incl. decoy-COM survival)
    "media_jpeg_probe": QuerySpec(xq.q_media_jpeg_probe, xq.ORACLE_MEDIA_JPEG_PROBE),
    # MP4/ISO-BMFF box-walk probe: mvhd v0/v1 → duration_ms, tkhd 16.16
    # dims of the first nonzero-width (video) track, stsd codec tag;
    # decoy fake-moov in a largesize mdat (r6 — video probe leg)
    "media_mp4_probe": QuerySpec(xq.q_media_mp4_probe, xq.ORACLE_MEDIA_MP4_PROBE),
    # MP4 sample-table expansion (stts/stsz/stsc/stco → per-frame
    # offset/size/pts), payload checksummed at the stco offset — the
    # ranged-read frame-sampling index (r6)
    "media_mp4_frames": QuerySpec(
        xq.q_media_mp4_frames, xq.ORACLE_MEDIA_MP4_FRAMES
    ),
    # shared-frame near-dup pairs (video dedup recipe over the
    # deterministic frame-sampling stand-in)
    "frame_overlap_pairs": QuerySpec(xq.q_frame_overlap_pairs, xq.ORACLE_FRAME_OVERLAP_PAIRS),
    # --- events: streaming-equivalent windows + JSON ---
    "events_hourly": QuerySpec(xq.q_events_hourly, xq.ORACLE_EVENTS_HOURLY, headline=True),
    "events_sliding": QuerySpec(xq.q_events_sliding, xq.ORACLE_EVENTS_SLIDING),
    "events_json_stats": QuerySpec(xq.q_events_json_stats, xq.ORACLE_EVENTS_JSON),
    # --- declarative DQ rules + wider SQL surface ---
    "dq_rules": QuerySpec(sq.q_dq_rules, sq.ORACLE_DQ_RULES, headline=True),
    "rollup_volume": QuerySpec(sq.q_rollup_volume, sq.ORACLE_ROLLUP_VOLUME),
    "set_ops": QuerySpec(sq.q_set_ops, sq.ORACLE_SET_OPS),
    "asof_last_order": QuerySpec(sq.q_asof_last_order, sq.ORACLE_ASOF_LAST_ORDER, headline=True),
    # nearest-direction as-of with tolerance (merge_asof semantics)
    "asof_nearest_order": QuerySpec(sq.q_asof_nearest_order, sq.ORACLE_ASOF_NEAREST),
    "session_windows": QuerySpec(sq.q_session_windows, sq.ORACLE_SESSION_WINDOWS),
    # exact columns oracle-checked; within_tol booleans gate the sketch
    "approx_distinct": QuerySpec(sq.q_approx_distinct, sq.ORACLE_APPROX_DISTINCT),
    "profile_orders": QuerySpec(sq.q_profile_orders, sq.ORACLE_PROFILE_ORDERS),
    "snapshot_drift": QuerySpec(sq.q_snapshot_drift, sq.ORACLE_SNAPSHOT_DRIFT, headline=True),
    "distribution_stats": QuerySpec(sq.q_distribution_stats, sq.ORACLE_DISTRIBUTION_STATS),
    "volume_anomalies": QuerySpec(sq.q_volume_anomalies, sq.ORACLE_VOLUME_ANOMALIES),
    "cube_volume": QuerySpec(sq.q_cube_volume, sq.ORACLE_CUBE_VOLUME),
    "temporal_gaps": QuerySpec(sq.q_temporal_gaps, sq.ORACLE_TEMPORAL_GAPS, headline=True),
    "fd_check": QuerySpec(sq.q_fd_check, sq.ORACLE_FD_CHECK),
    "dqa_report": QuerySpec(sq.q_dqa_report, sq.ORACLE_DQA_REPORT),
    "price_histogram": QuerySpec(sq.q_price_histogram, sq.ORACLE_PRICE_HISTOGRAM),
    # same SQL text runs on both engines (raw-SQL entry point)
    "small_quantity": QuerySpec(sq.q_small_quantity, sq.SQL_SMALL_QUANTITY),
    # shared-SQL LATERAL correlated subquery (Catalyst decorrelation)
    "lateral_top_bal": QuerySpec(sq.q_lateral_top_bal, sq.SQL_LATERAL_TOP_BAL),
    # --- embedding QA + int8 quantized similarity ---
    "embedding_qa": QuerySpec(pq.q_embedding_qa, pq.ORACLE_EMBEDDING_QA),
    "quant_summary": QuerySpec(pq.q_quant_summary, pq.ORACLE_QUANT_SUMMARY),
    # quantization is a pure function of the input, so this
    # "approximate" ANN path is FULLY differential (unlike LSH/IVF)
    "quantized_topk": QuerySpec(pq.q_quantized_topk, pq.ORACLE_QUANTIZED_TOPK, headline=True),
    # --- drift / event analytics ---
    "ks_drift": QuerySpec(pq.q_ks_drift, pq.ORACLE_KS_DRIFT),
    # high-cardinality KS twin: exact micro-unit values, exercises the
    # two-phase bucketed cumulative at the driver gate (r5)
    "ks_value_drift": QuerySpec(pq.q_ks_value_drift, pq.ORACLE_KS_VALUE_DRIFT),
    "funnel": QuerySpec(pq.q_funnel, pq.ORACLE_FUNNEL, headline=True),
    # first-touch conversion-window funnel (greedy fold carries anchor)
    "funnel_windowed": QuerySpec(pq.q_funnel_windowed, pq.ORACLE_FUNNEL_WINDOWED),
    "state_history": QuerySpec(pq.q_state_history, pq.ORACLE_STATE_HISTORY),
    # --- profiling extensions ---
    "iqr_outliers": QuerySpec(pq.q_iqr_outliers, pq.ORACLE_IQR_OUTLIERS),
    "cat_entropy": QuerySpec(pq.q_cat_entropy, pq.ORACLE_CAT_ENTROPY),
    "transitions": QuerySpec(pq.q_transitions, pq.ORACLE_TRANSITIONS),
    "rolling_values": QuerySpec(pq.q_rolling_values, pq.ORACLE_ROLLING_VALUES),
    # cross-table lifecycle ordering (fact-fact co-partitioned join)
    "date_order": QuerySpec(pq.q_date_order, pq.ORACLE_DATE_ORDER, headline=True),
    "top_customer_per_nation": QuerySpec(pq.q_top_customer_per_nation, pq.ORACLE_TOP_CUSTOMER),
    "numeric_corr": QuerySpec(pq.q_numeric_corr, pq.ORACLE_NUMERIC_CORR),
    # batch twin of the watermarked stream-stream attribution join
    "attribution": QuerySpec(pq.q_attribution, pq.ORACLE_ATTRIBUTION),
    # --- sequence packing + corpus mixture (training-data last mile) ---
    "pack_chunks": QuerySpec(pq.q_pack_chunks, pq.ORACLE_PACK_CHUNKS),
    # stateful applyInPandas scan; oracle replays it via recursive CTE
    "pack_next_fit": QuerySpec(pq.q_pack_next_fit, pq.ORACLE_PACK_NEXT_FIT, headline=True),
    "pack_summary": QuerySpec(pq.q_pack_summary, pq.ORACLE_PACK_SUMMARY),
    "mixture_weights": QuerySpec(pq.q_mixture_weights, pq.ORACLE_MIXTURE_WEIGHTS),
    # --- mergeable HLL distinct sketches + unpivot ---
    "hll_distinct": QuerySpec(pq.q_hll_distinct, pq.ORACLE_HLL_DISTINCT),
    "hll_rollup": QuerySpec(pq.q_hll_rollup, pq.ORACLE_HLL_ROLLUP),
    "unpivot_measures": QuerySpec(pq.q_unpivot_measures, pq.ORACLE_UNPIVOT_MEASURES),
    # native VARIANT semi-structured extraction (parse once, typed paths)
    "variant_stats": QuerySpec(pq.q_variant_stats, pq.ORACLE_VARIANT_STATS),
    # composed C4/Gopher filter + end-to-end corpus build
    "quality_filter": QuerySpec(pq.q_quality_filter, pq.ORACLE_QUALITY_FILTER),
    "corpus_clean": QuerySpec(pq.q_corpus_clean, pq.ORACLE_CORPUS_CLEAN, headline=True),
    # time-grid regularization with forward fill
    "resample_ffill": QuerySpec(pq.q_resample_ffill, pq.ORACLE_RESAMPLE_FFILL),
    # per-dimension feature-scaling profile
    "dim_stats": QuerySpec(pq.q_dim_stats, pq.ORACLE_DIM_STATS),
    # temporal_gaps collapsed into actionable backfill jobs
    "backfill_ranges": QuerySpec(pq.q_backfill_ranges, pq.ORACLE_BACKFILL_RANGES),
    # two-phase skew-safe exact distinct
    "distinct_users_by_type": QuerySpec(pq.q_distinct_users_by_type, pq.ORACLE_DISTINCT_USERS),
    # --- skew measurement + salted-join mitigation (result ≡ plain join) ---
    "key_skew": QuerySpec(pq.q_key_skew, pq.ORACLE_KEY_SKEW),
    "salted_revenue": QuerySpec(pq.q_salted_revenue, pq.ORACLE_SALTED_REVENUE, headline=True),
    # --- embedding-space dedup + label QA ---
    "semantic_clusters": QuerySpec(pq.q_semantic_clusters, pq.ORACLE_SEMANTIC_CLUSTERS),
    # composed pipeline: pairs -> components -> removal -> kept corpus
    "semantic_keep": QuerySpec(pq.q_semantic_keep, pq.ORACLE_SEMANTIC_KEEP),
    # banded-SRP candidate twins of the exact all-pairs consumers: same
    # recursive-CTE oracles at the twin threshold; recall-1.0 banding
    # pinned in tests/test_round4_ops.py (threshold choice documented
    # at pipeline_queries._LSH_THR — >=0.8 is vacuous on this corpus)
    "semantic_clusters_lsh": QuerySpec(
        pq.q_semantic_clusters_lsh, pq.ORACLE_SEMANTIC_CLUSTERS_LSH
    ),
    "semantic_keep_lsh": QuerySpec(pq.q_semantic_keep_lsh, pq.ORACLE_SEMANTIC_KEEP_LSH),
    "knn_agreement": QuerySpec(pq.q_knn_agreement, pq.ORACLE_KNN_AGREEMENT, headline=True),
    # --- shared-SQL analytics surface ---
    "grouping_sets": QuerySpec(pq.q_grouping_sets, pq.SQL_GROUPING_SETS),
    "shipping_priority": QuerySpec(pq.q_shipping_priority, pq.SQL_SHIPPING_PRIORITY, headline=True),
    # --- referential integrity discovery + seasonal anomaly + windowed distinct ---
    "fk_discovery": QuerySpec(pq.q_fk_discovery, pq.ORACLE_FK_DISCOVERY, headline=True),
    "dow_anomalies": QuerySpec(pq.q_dow_anomalies, pq.ORACLE_DOW_ANOMALIES),
    "sliding_distinct_users": QuerySpec(
        pq.q_sliding_distinct_users, pq.ORACLE_SLIDING_DISTINCT
    ),
    # --- embedding class separability + tolerance-gated quantile sketch ---
    "label_centroid_sim": QuerySpec(pq.q_label_centroid_sim, pq.ORACLE_LABEL_CENTROID_SIM),
    "approx_quantiles": QuerySpec(pq.q_approx_quantiles, pq.ORACLE_APPROX_QUANTILES),
    # --- time-RANGE frames, grouped exact percentiles, mergeable partials ---
    "range_rolling": QuerySpec(pq.q_range_rolling, pq.ORACLE_RANGE_ROLLING),
    "group_percentiles": QuerySpec(pq.q_group_percentiles, pq.ORACLE_GROUP_PERCENTILES),
    "incremental_volume": QuerySpec(
        pq.q_incremental_volume, pq.ORACLE_INCREMENTAL_VOLUME, headline=True
    ),
    # frame-sampling fan-out accounting (multimodal plumbing gate)
    "frame_stats": QuerySpec(pq.q_frame_stats, pq.ORACLE_FRAME_STATS),
    # schema-on-read MAP explode over unknown JSON keys
    "props_map_stats": QuerySpec(pq.q_props_map_stats, pq.ORACLE_PROPS_MAP_STATS),
    # weekly cohort retention triangle
    "retention": QuerySpec(pq.q_retention, pq.ORACLE_RETENTION),
    # candidate-key uniqueness + robust MAD outliers
    "candidate_keys": QuerySpec(pq.q_candidate_keys, pq.ORACLE_CANDIDATE_KEYS),
    "mad_outliers": QuerySpec(pq.q_mad_outliers, pq.ORACLE_MAD_OUTLIERS),
    # alpha-temperature sampling mix (low-resource upsampling rule)
    "temperature_mixture": QuerySpec(pq.q_temperature_mixture, pq.ORACLE_TEMPERATURE_MIXTURE),
    # keyword retrieval + LM-proxy quality scoring
    "bm25_search": QuerySpec(xq.q_bm25_search, xq.ORACLE_BM25_SEARCH, headline=True),
    "lm_score": QuerySpec(xq.q_lm_score, xq.ORACLE_LM_SCORE, headline=True),
    # RAG sliding-window chunking + BPE tokenizer training
    "chunk_overlap": QuerySpec(xq.q_chunk_overlap, xq.ORACLE_CHUNK_OVERLAP, headline=True),
    # unrolled-iteration DuckDB replay (materialized CTE per merge
    # round, double-space-separator greedy merge application)
    "bpe_merges": QuerySpec(xq.q_bpe_merges, xq.ORACLE_BPE_MERGES),
    # train -> encode loop closed: per-doc token bill under the learned
    # merges; oracle reuses the chain's final word symbolization
    "bpe_token_budget": QuerySpec(xq.q_bpe_token_budget, xq.ORACLE_BPE_TOKEN_BUDGET),
    # count-min sketch top-k (md5-derived -> oracle replays the exact
    # counter matrix; epsilon bound surfaced as a checked column)
    "cms_heavy_hitters": QuerySpec(
        xq.q_cms_heavy_hitters, xq.ORACLE_CMS_HEAVY_HITTERS, headline=True
    ),
    # fuzzy-exact dedup: canonical groups after case/punct/ws normalize
    "normalized_dedup": QuerySpec(xq.q_normalized_dedup, xq.ORACLE_NORMALIZED_DEDUP),
    # market-basket lift over user x event-type presence
    "event_pair_lift": QuerySpec(xq.q_event_pair_lift, xq.ORACLE_EVENT_PAIR_LIFT),
    # record linkage closed: fuzzy pairs -> components -> canonical ids
    "entity_resolution": QuerySpec(xq.q_entity_resolution, xq.ORACLE_ENTITY_RESOLUTION),
    # per-table health rollup of the rule suite (pass rate + severity)
    "dq_scorecard": QuerySpec(sq.q_dq_scorecard, sq.ORACLE_DQ_SCORECARD),
    # per-source exact-duplicate mass (curation triage)
    "dup_rate_by_source": QuerySpec(
        xq.q_dup_rate_by_source, xq.ORACLE_DUP_RATE_BY_SOURCE, headline=True
    ),
    # near-dup graph degree histogram (banding-tuning diagnostic)
    "dedup_graph_stats": QuerySpec(xq.q_dedup_graph_stats, xq.ORACLE_DEDUP_GRAPH_STATS),
    # leakage-safe deterministic train/val/test split (md5 uniform)
    "hash_split": QuerySpec(xq.q_hash_split, xq.ORACLE_HASH_SPLIT, headline=True),
    # outlier-robust winsorized moments (exact p01/p99 clamp)
    "winsorized_stats": QuerySpec(xq.q_winsorized_stats, xq.ORACLE_WINSORIZED_STATS),
    # Zipf rank-frequency slope (templated/boilerplate corpus flag)
    "zipf_fit": QuerySpec(xq.q_zipf_fit, xq.ORACLE_ZIPF_FIT),
    # CEP pattern with negation (A then B within window, no C between)
    "cep_pattern": QuerySpec(xq.q_cep_pattern, xq.ORACLE_CEP_PATTERN),
    # class-balance audit of the labeled set (NULL label = finding)
    "label_balance": QuerySpec(xq.q_label_balance, xq.ORACLE_LABEL_BALANCE),
    # Heaps'-law vocabulary growth (templated-corpus flag; one
    # first-occurrence reduction, no per-checkpoint text rescans)
    "vocab_growth": QuerySpec(xq.q_vocab_growth, xq.ORACLE_VOCAB_GROWTH),
    # Good-Turing unseen-mass vocabulary card (tokenizer planning)
    "vocab_coverage": QuerySpec(xq.q_vocab_coverage, xq.ORACLE_VOCAB_COVERAGE),
    # idf-weighted soft Jaccard (integer micro-idf sums, one division)
    "idf_weighted_jaccard": QuerySpec(
        xq.q_idf_weighted_jaccard, xq.ORACLE_IDF_WEIGHTED_JACCARD
    ),
    # behavioral journey similarity: top-20 user pairs by Levenshtein
    # over journey strings (top-k => never vacuous)
    "journey_similarity": QuerySpec(
        xq.q_journey_similarity, xq.ORACLE_JOURNEY_SIMILARITY
    ),
    # per-type daily-volume OLS slope (exact-integer sufficient stats)
    "volume_trend": QuerySpec(xq.q_volume_trend, xq.ORACLE_VOLUME_TREND),
    # per-key JSON type-inference profile (schema-on-read decision)
    "json_schema_profile": QuerySpec(
        xq.q_json_schema_profile, xq.ORACLE_JSON_SCHEMA_PROFILE
    ),
    # event-time disorder lags (the stat that sizes a watermark;
    # companion to streaming/lateness.py's drop accounting)
    "event_disorder": QuerySpec(xq.q_event_disorder, xq.ORACLE_EVENT_DISORDER),
    # k-anonymity release gate over quasi-identifier classes
    "k_anonymity": QuerySpec(xq.q_k_anonymity, xq.ORACLE_K_ANONYMITY),
    # CUSUM level-shift detection over the daily volume series
    "cusum_changepoint": QuerySpec(xq.q_cusum_changepoint, xq.ORACLE_CUSUM_CHANGEPOINT),
    # deterministic Poisson bootstrap CI (md5 uniforms + integer-cent
    # replica means -> the whole resampling scheme is oracle-replayed)
    "bootstrap_ci": QuerySpec(xq.q_bootstrap_ci, xq.ORACLE_BOOTSTRAP_CI),
    # EXISTS → LEFT SEMI decorrelation (TPC-H Q4 shape; shared SQL text)
    "late_shipments": QuerySpec(pq.q_late_shipments, pq.ORACLE_LATE_SHIPMENTS, headline=True),
    # row-content checksum reconciliation (strong form of reference J1)
    "content_checksums": QuerySpec(pq.q_content_checksums, pq.ORACLE_CONTENT_CHECKSUMS, headline=True),
    # per-source LM-quality rollup (mixture-policy input)
    "source_lm_quality": QuerySpec(xq.q_source_lm_quality, xq.ORACLE_SOURCE_LM_QUALITY, headline=True),
    # percent_rank / cume_dist / ntile window surface (shared SQL text)
    "value_ranks": QuerySpec(pq.q_value_ranks, pq.ORACLE_VALUE_RANKS),
    # EWMA control chart (small persistent drift; recursive-CTE oracle)
    "ewma_volume": QuerySpec(pq.q_ewma_volume, pq.ORACLE_EWMA_VOLUME, headline=True),
    # exact earth-mover drift magnitude (integer numerator contract)
    "w1_drift": QuerySpec(pq.q_w1_drift, pq.ORACLE_W1_DRIFT, headline=True),
    # dump-vs-corpus incremental near-dedup (banded cross-set join,
    # exact verify; recall-1.0-at-threshold pinned in pytest => oracle
    # is the exact cross-set pair list)
    "incremental_dedup": QuerySpec(xq.q_incremental_dedup, xq.ORACLE_INCREMENTAL_DEDUP, headline=True),
    # deterministic weight-proportional sampling (A-ES, md5 uniforms)
    "weighted_sample": QuerySpec(xq.q_weighted_sample, xq.ORACLE_WEIGHTED_SAMPLE, headline=True),
    # interval-overlap stats: sweep-line headline (no pair
    # materialization) + bucketed pair-join twin, one oracle (the
    # O(n²) theta join) gating both
    "transit_overlaps": QuerySpec(xq.q_transit_overlaps, xq.ORACLE_TRANSIT_OVERLAPS, headline=True),
    "transit_overlaps_pairs": QuerySpec(xq.q_transit_overlaps_pairs, xq.ORACLE_TRANSIT_OVERLAPS),
    # cross-source shingle-overlap matrix (re-crawl diagnostic)
    "source_overlap": QuerySpec(xq.q_source_overlap, xq.ORACLE_SOURCE_OVERLAP),
    # boilerplate detection: top-k n-grams by doc frequency, hash-only shuffle
    "frequent_ngrams": QuerySpec(xq.q_frequent_ngrams, xq.ORACLE_FREQUENT_NGRAMS, headline=True),
    # quality-aware cluster representative selection (argmax, min-id ties)
    "quality_keepers": QuerySpec(xq.q_quality_keepers, xq.ORACLE_QUALITY_KEEPERS),
    # pre-join fan-out audit (counts joined, product computed not materialized)
    "join_explosion": QuerySpec(xq.q_join_explosion, xq.ORACLE_JOIN_EXPLOSION),
    # PMI collocation mining (multiword expressions for vocab curation)
    "pmi_collocations": QuerySpec(xq.q_pmi_collocations, xq.ORACLE_PMI_COLLOCATIONS),
    # CCNet head/middle/tail perplexity-bucket pruning
    "ppl_buckets": QuerySpec(xq.q_ppl_buckets, xq.ORACLE_PPL_BUCKETS),
    # categorical JS drift (weekday vs weekend event-type mix)
    "weekend_drift": QuerySpec(xq.q_weekend_drift, xq.ORACLE_WEEKEND_DRIFT),
    # two-phase global row numbering (no single-partition window)
    "global_index": QuerySpec(xq.q_global_index, xq.ORACLE_GLOBAL_INDEX, headline=True),
    # exact global order statistics by distribution counting (the
    # 100 TB exact-quantile shape; integer cents end to end)
    "exact_global_quantiles": QuerySpec(
        pq.q_exact_global_quantiles, pq.ORACLE_EXACT_GLOBAL_QUANTILES, headline=True
    ),
    # one-scan corpus data card (long-format release stats)
    "corpus_card": QuerySpec(xq.q_corpus_card, xq.ORACLE_CORPUS_CARD, headline=True),
    # column-dependence audit (per-cell MI decomposition)
    "mutual_info": QuerySpec(xq.q_mutual_info, xq.ORACLE_MUTUAL_INFO),
    # constraint suggestion (profile -> candidate rule suite)
    "suggest_rules": QuerySpec(xq.q_suggest_rules, xq.ORACLE_SUGGEST_RULES),
    # format-shape profiling (digits->9 / lower->a / upper->A histograms)
    "pattern_profile": QuerySpec(xq.q_pattern_profile, xq.ORACLE_PATTERN_PROFILE),
    # Johnson-Lindenstrauss signed projection (md5-derived, map-only)
    "jl_project": QuerySpec(xq.q_jl_project, xq.ORACLE_JL_PROJECT),
    # CDC log compaction to final state (latest-op-wins, deletes drop)
    "cdc_state": QuerySpec(xq.q_cdc_state, xq.ORACLE_CDC_STATE),
    # Pareto/ABC revenue contribution (cumulative window over bounded rollup)
    "pareto_nations": QuerySpec(xq.q_pareto_nations, xq.ORACLE_PARETO_NATIONS),
    # behavioral path mining (per-user distinct event n-grams)
    "event_paths": QuerySpec(xq.q_event_paths, xq.ORACLE_EVENT_PATHS),
    # funnel time-to-convert summary (integer-second lags)
    "conversion_lag": QuerySpec(xq.q_conversion_lag, xq.ORACLE_CONVERSION_LAG),
    # --- advanced join / decorrelation shapes (TPC-H style; oracles
    # keep the CORRELATED subquery form so the gate proves the
    # DataFrame decorrelation is semantics-preserving) ---
    # Q2 shape: correlated scalar MIN -> per-group agg broadcast join
    "min_price_parts": QuerySpec(th.q_min_price_parts, th.ORACLE_MIN_PRICE_PARTS),
    # Q13 shape: left-outer count distribution incl. zero-order customers
    "order_count_distribution": QuerySpec(
        th.q_order_count_distribution, th.ORACLE_ORDER_COUNT_DISTRIBUTION, headline=True
    ),
    # Q15 shape: aggregate view + scalar-MAX filter (exact-cents revenue)
    "top_supplier_revenue": QuerySpec(th.q_top_supplier_revenue, th.ORACLE_TOP_SUPPLIER_REVENUE),
    # Q16 shape: NOT IN -> broadcast anti join + grouped COUNT DISTINCT
    "supplier_parts_excl": QuerySpec(th.q_supplier_parts_excl, th.ORACLE_SUPPLIER_PARTS_EXCL),
    # Q18 shape: grouped-HAVING IN subquery driving semi-style joins
    "large_volume_orders": QuerySpec(th.q_large_volume_orders, th.ORACLE_LARGE_VOLUME_ORDERS),
    # Q20 flavor: correlated per-group AVG (deterministic integer cents)
    "above_avg_suppliers": QuerySpec(th.q_above_avg_suppliers, th.ORACLE_ABOVE_AVG_SUPPLIERS),
    # Q21 shape: EXISTS + NOT EXISTS chain -> hash semi + anti joins
    "sole_return_suppliers": QuerySpec(
        th.q_sole_return_suppliers, th.ORACLE_SOLE_RETURN_SUPPLIERS, headline=True
    ),
    # Q22 shape: global scalar AVG + anti join, per-nation rollup
    "idle_rich_customers": QuerySpec(th.q_idle_rich_customers, th.ORACLE_IDLE_RICH_CUSTOMERS),
    # Q6 shape: pure filter-and-aggregate, all predicates pushed to the
    # scan; exact integer ten-thousandths revenue; shared SQL text —
    # completes the Q1-Q22 plan-shape sweep
    "forecast_revenue": QuerySpec(th.q_forecast_revenue, th.SQL_FORECAST_REVENUE),
    # Q7 shape: 5-way star join, nation-pair x year revenue flows
    "nation_trade_flows": QuerySpec(
        th.q_nation_trade_flows, th.ORACLE_NATION_TRADE_FLOWS, headline=True
    ),
    # Q9 shape: part-filtered profit by supplier nation x order year
    "product_profit": QuerySpec(th.q_product_profit, th.ORACLE_PRODUCT_PROFIT),
    # Q14 shape: CASE-inside-aggregate ratio (exact-cents)
    "promo_revenue_share": QuerySpec(
        th.q_promo_revenue_share, th.ORACLE_PROMO_REVENUE_SHARE
    ),
    # Q19 shape: OR-of-ANDs join predicate (disjunctive pushdown)
    "disjunctive_revenue": QuerySpec(
        th.q_disjunctive_revenue, th.ORACLE_DISJUNCTIVE_REVENUE, headline=True
    ),
    # Q8 shape: market-share CASE ratio over a 6-way star join
    "market_share": QuerySpec(th.q_market_share, th.ORACLE_MARKET_SHARE, headline=True),
    # Q10 shape: top-N customers by returned-line revenue
    "returned_customers": QuerySpec(
        th.q_returned_customers, th.ORACLE_RETURNED_CUSTOMERS
    ),
    # Q12 shape: CASE-count pivot by derived delay bucket
    "ship_delay_priority": QuerySpec(
        th.q_ship_delay_priority, th.ORACLE_SHIP_DELAY_PRIORITY
    ),
    # --- graph analytics (iterative rank loop; unrolled-CTE oracle) ---
    "pagerank_events": QuerySpec(
        gq.q_pagerank_events, gq.ORACLE_PAGERANK_EVENTS, headline=True
    ),
    # multi-source BFS blast radius over the near-dup graph (fixed
    # 4-round frontier expansion; unrolled min-hop CTE oracle)
    "bfs_hops": QuerySpec(gq.q_bfs_hops, gq.ORACLE_BFS_HOPS, headline=True),
    # 2-core peeling of the near-dup graph (dense boilerplate families;
    # unrolled degree/keep peel rounds in the oracle)
    "kcore_boilerplate": QuerySpec(
        gq.q_kcore_boilerplate, gq.ORACLE_KCORE_BOILERPLATE
    ),
    # --- dense linear algebra over embeddings (Arrow Gramian partials) ---
    "embedding_covariance": QuerySpec(
        lq.q_embedding_covariance, lq.ORACLE_EMBEDDING_COVARIANCE, headline=True
    ),
    # --- hybrid retrieval: BM25 ⊕ dense cosine fused by RRF ---
    "hybrid_rrf": QuerySpec(fq.q_hybrid_rrf, fq.ORACLE_HYBRID_RRF, headline=True),
    # ranking-eval readout: NDCG@5 of dense retrieval vs weak labels
    # (rank-ordered running-sum DCG fold on both engines)
    "retrieval_ndcg": QuerySpec(fq.q_retrieval_ndcg, fq.ORACLE_RETRIEVAL_NDCG),
    # per-nation Gini revenue concentration (exact integer-cents
    # Σ(2i−n−1)x numerator, ONE final division)
    "gini_orders": QuerySpec(pq.q_gini_orders, pq.ORACLE_GINI_ORDERS),
    # per-type activity concentration (bot/whale detector), same
    # exact-integer Gini contract over events-per-user
    "gini_users": QuerySpec(pq.q_gini_users, pq.ORACLE_GINI_USERS),
    # Lloyd's k-means, fixed rounds, deterministic seeding (unrolled oracle)
    "kmeans_clusters": QuerySpec(
        lq.q_kmeans_clusters, lq.ORACLE_KMEANS_CLUSTERS, headline=True
    ),
    # hashed-linear quality-classifier inference + its PR-curve eval sweep
    "quality_classifier": QuerySpec(
        cq.q_quality_classifier, cq.ORACLE_QUALITY_CLASSIFIER
    ),
    # reliability-diagram bins of the classifier vs the weak label
    "classifier_calibration": QuerySpec(
        cq.q_classifier_calibration, cq.ORACLE_CLASSIFIER_CALIBRATION
    ),
    # closed-form OLS via exact normal equations (shared SQL text)
    "ols_price_model": QuerySpec(
        rg.q_ols_price_model, rg.ORACLE_OLS_PRICE_MODEL, headline=True
    ),
    # leakage-free split: near-dup clusters assigned whole to one split
    "cluster_safe_split": QuerySpec(
        xq.q_cluster_safe_split, xq.ORACLE_CLUSTER_SAFE_SPLIT
    ),
    "classifier_pr_curve": QuerySpec(
        cq.q_classifier_pr_curve, cq.ORACLE_CLASSIFIER_PR_CURVE, headline=True
    ),
    # Lee-et-al-style exact-substring (sliding k-gram) dup coverage
    "substring_dup": QuerySpec(
        uq.q_substring_dup, uq.ORACLE_SUBSTRING_DUP, headline=True
    ),
    # EMD release gate completing the k-anonymity/l-diversity trio
    "t_closeness": QuerySpec(uq.q_t_closeness, uq.ORACLE_T_CLOSENESS),
    # centroid-silhouette quality of the converged kmeans clustering
    "kmeans_silhouette": QuerySpec(
        uq.q_kmeans_silhouette, uq.ORACLE_KMEANS_SILHOUETTE, headline=True
    ),
    # Cohen's kappa between the lang-ID and classifier weak labelers
    "rater_kappa": QuerySpec(uq.q_rater_kappa, uq.ORACLE_RATER_KAPPA),
    # easy-to-hard round-robin shard dealing, two-phase numbering
    "curriculum_shards": QuerySpec(
        uq.q_curriculum_shards, uq.ORACLE_CURRICULUM_SHARDS
    ),
    # mean-IDF novelty score per document (integer-exact micro-idf)
    "doc_rarity": QuerySpec(uq.q_doc_rarity, uq.ORACLE_DOC_RARITY, headline=True),
    # greedy MMR diversification over dense top-k candidates
    "mmr_rerank": QuerySpec(uq.q_mmr_rerank, uq.ORACLE_MMR_RERANK, headline=True),
    # per-source rank → global-distribution quantile mapping
    "quantile_norm": QuerySpec(uq.q_quantile_norm, uq.ORACLE_QUANTILE_NORM),
    # 4-round synchronous label propagation over the near-dup graph
    "lp_communities": QuerySpec(
        uq.q_lp_communities, uq.ORACLE_LP_COMMUNITIES, headline=True
    ),
    # TPC-H Q4 shape: EXISTS late-lineitem semi-join, count by priority
    "priority_late_orders": QuerySpec(
        th.q_priority_late_orders, th.ORACLE_PRIORITY_LATE_ORDERS
    ),
    # TPC-H Q11 shape: HAVING sum > fraction of a global scalar
    "revenue_concentration": QuerySpec(
        th.q_revenue_concentration, th.ORACLE_REVENUE_CONCENTRATION
    ),
    # split-conformal threshold + held-out coverage check
    "conformal_threshold": QuerySpec(
        uq.q_conformal_threshold, uq.ORACLE_CONFORMAL_THRESHOLD
    ),
    # cluster-safe deterministic contrastive negative mining
    "negative_sample": QuerySpec(
        uq.q_negative_sample, uq.ORACLE_NEGATIVE_SAMPLE
    ),
    # embedding-space eval decontamination (paraphrase-robust twin of
    # the n-gram decontam recipe)
    "semantic_decontam": QuerySpec(
        uq.q_semantic_decontam, uq.ORACLE_SEMANTIC_DECONTAM
    ),
    # Mann-Whitney U rank drift between two sources (tie-corrected z)
    "mw_drift": QuerySpec(uq.q_mw_drift, uq.ORACLE_MW_DRIFT),
    # combined n-gram ⊕ semantic contamination verdict per corpus doc
    # (composition gate over two already-gated decontam recipes)
    "contamination_report": QuerySpec(
        uq.q_contamination_report, uq.ORACLE_CONTAMINATION_REPORT
    ),
    # Kaplan-Meier churn curve (censoring-aware retention)
    "survival_km": QuerySpec(vq.q_survival_km, vq.ORACLE_SURVIVAL_KM, headline=True),
    # two-proportion A/B readout with pooled z statistic
    "ab_ztest": QuerySpec(vq.q_ab_ztest, vq.ORACLE_AB_ZTEST),
    # triangle/clustering-coefficient audit of the near-dup pair graph
    "dedup_triangles": QuerySpec(xq.q_dedup_triangles, xq.ORACLE_DEDUP_TRIANGLES),
    # DBSCAN density clustering (blocked all-pairs -> components -> roles)
    "dbscan_clusters": QuerySpec(
        lq.q_dbscan_clusters, lq.ORACLE_DBSCAN_CLUSTERS, headline=True
    ),
    # banded-SRP candidate twin (see semantic_*_lsh above)
    "dbscan_lsh": QuerySpec(lq.q_dbscan_lsh, lq.ORACLE_DBSCAN_LSH),
    # class-balanced downsampling (membership-checksummed)
    "class_rebalance": QuerySpec(xq.q_class_rebalance, xq.ORACLE_CLASS_REBALANCE),
    # l-diversity privacy gate (k-anonymity's sensitive-value sibling)
    "l_diversity": QuerySpec(xq.q_l_diversity, xq.ORACLE_L_DIVERSITY),
    # Markov removal-effect multi-touch attribution (unrolled-chain oracle)
    "markov_attribution": QuerySpec(
        aq.q_markov_attribution, aq.ORACLE_MARKOV_ATTRIBUTION, headline=True
    ),
    # --- r5 additions ---
    # DSIR importance resampling: unigram target/corpus log-ratio
    # scores + top-k selection flag (token-sorted fold, hash-stable)
    "dsir_select": QuerySpec(uq.q_dsir_select, uq.ORACLE_DSIR_SELECT, headline=True),
    # CommonCrawl-style per-source quota cap with membership checksum
    "source_quota": QuerySpec(uq.q_source_quota, uq.ORACLE_SOURCE_QUOTA),
    # rank-biased overlap between the lexical and dense rankings
    # (per-depth rows, literal-injected weights — no ordered FP sum)
    "rbo_rankings": QuerySpec(fq.q_rbo_rankings, fq.ORACLE_RBO_RANKINGS),
    # exact largest-remainder stratified sample (Hamilton allocation;
    # md5-ordered membership, id-sum checksum)
    "stratified_sample": QuerySpec(
        uq.q_stratified_sample, uq.ORACLE_STRATIFIED_SAMPLE
    ),
    # per-doc 3-gram novelty in ingestion order (first-owner wins)
    "ngram_novelty": QuerySpec(uq.q_ngram_novelty, uq.ORACLE_NGRAM_NOVELTY),
    # lagged cross-correlation of daily revenue vs daily activity
    # (exact DECIMAL sufficient stats; r as one guarded division)
    "lag_xcorr": QuerySpec(pq.q_lag_xcorr, pq.ORACLE_LAG_XCORR),
    # seasonal-naive forecast-quality audit (exact integer cents)
    "mase_forecast": QuerySpec(pq.q_mase_forecast, pq.ORACLE_MASE_FORECAST),
    # Z-order zone-map pruning audit: Morton-grid files vs single-column
    # sorts, files/rows touched by a 2-D range predicate (integer-exact)
    "zorder_skipping": QuerySpec(
        sc.q_zorder_skipping, sc.ORACLE_ZORDER_SKIPPING, headline=True
    ),
    # MinHash estimator-accuracy audit on the verified near-dup pairs
    # (engine-portable md5+Carter-Wegman family, integer-scaled error)
    "minhash_error": QuerySpec(sc.q_minhash_error, sc.ORACLE_MINHASH_ERROR),
    # tokens-per-word by detected language (tokenizer budgeting)
    "token_fertility": QuerySpec(sc.q_token_fertility, sc.ORACLE_TOKEN_FERTILITY),
    # Hilbert-curve vs Z-order zone-map pruning on the same 256×256
    # grid + 2-D predicate (65,536-row broadcast curve lookup — the
    # liquid-clustering layout decision, measured on live data)
    "hilbert_skipping": QuerySpec(
        sc.q_hilbert_skipping, sc.ORACLE_HILBERT_SKIPPING
    ),
    # real WAV/PCM16 decode gate: RIFF walk + exact integer signal
    # stats (peak/energy/zero-cross/clipping), decoy-LIST + odd-pad
    # hardened; oracle replays the per-sample arithmetic
    "media_wav_decode": QuerySpec(
        xq.q_media_wav_decode, xq.ORACLE_MEDIA_WAV_DECODE
    ),
    # encoding-health audit: U+FFFD / C0-control / mojibake detection
    # regexes value-checked against deterministic injected damage
    "encoding_audit": QuerySpec(uq.q_encoding_audit, uq.ORACLE_ENCODING_AUDIT),
    # sink→layout→audit roundtrip: bucket-partitioned parquet write,
    # read-back, per-file balance via input_file_name (md5-replayable)
    "file_balance": QuerySpec(sc.q_file_balance, sc.ORACLE_FILE_BALANCE),
    # keyed MERGE/upsert sink roundtrip: CDC batch applied via the
    # anti-join rewrite + write-then-swap; oracle replays the merge
    # semantics (kept ∪ updated ∪ inserted) against the swapped target
    "merge_upsert": QuerySpec(sc.q_merge_upsert, sc.ORACLE_MERGE_UPSERT),
    # mergeSchema read gate over two differently-schemaed epochs
    "schema_evolution": QuerySpec(
        sc.q_schema_evolution, sc.ORACLE_SCHEMA_EVOLUTION
    ),
    # personalized PageRank: teleport confined to conversion states
    # (seeded influence; unrolled-CTE oracle like pagerank_events)
    "ppr_influence": QuerySpec(gq.q_ppr_influence, gq.ORACLE_PPR_INFLUENCE),
    # Newman modularity terms of the LP partition (community-quality
    # readout; oracle replays the LP chain + integer arithmetic)
    "graph_modularity": QuerySpec(
        gq.q_graph_modularity, gq.ORACLE_GRAPH_MODULARITY
    ),
    # degree assortativity of the near-dup graph (clique vs hub regime)
    "degree_assortativity": QuerySpec(
        gq.q_degree_assortativity, gq.ORACLE_DEGREE_ASSORTATIVITY
    ),
    # TF-IDF cosine pairs over 3-gram terms (vector-space text
    # near-dup: tf counts + cosine norm; integer micro-idf weights) —
    # exact-vocabulary BASELINE; the df-capped twin below is the
    # headline (uncapped postings join costs Σdf², unbounded on a
    # saturating real vocabulary)
    "tfidf_cosine_pairs": QuerySpec(
        xq.q_tfidf_cosine_pairs, xq.ORACLE_TFIDF_COSINE_PAIRS
    ),
    # df-capped TF-IDF twin (df ≤ 20): cosine over the capped
    # vocabulary — postings join bounded by cap·|postings|; measured
    # IDENTICAL output at sf0.1. The TF-IDF family headline (r5 #2).
    "tfidf_cosine_pairs_capped": QuerySpec(
        xq.q_tfidf_cosine_pairs_capped,
        xq.ORACLE_TFIDF_COSINE_PAIRS_CAPPED,
        headline=True,
    ),
    # perceptual-hash media near-dup: PNG roundtrip → dHash → lossless
    # 4-band blocking → hamming ≤ 3 verify (pixel-structure dedup)
    "media_dhash_pairs": QuerySpec(
        xq.q_media_dhash_pairs, xq.ORACLE_MEDIA_DHASH_PAIRS
    ),
    # hot-bucket cost audit of the dHash band join: per band, bucket
    # sizes + pair mass + the mass a max_bucket_size cap would drop
    # (r6 — makes the LSH mega-bucket guard's trade visible)
    "band_bucket_audit": QuerySpec(
        xq.q_band_bucket_audit, xq.ORACLE_BAND_BUCKET_AUDIT
    ),
    # the guard ARMED (cap 30): pairs sharing only >30-member band
    # buckets are dropped — the oracle replays the cap bucket by
    # bucket, so the guard's exact semantics are differential-gated
    "media_dhash_pairs_capped": QuerySpec(
        xq.q_media_dhash_pairs_capped, xq.ORACLE_MEDIA_DHASH_PAIRS_CAPPED
    ),
    # STL-lite trend/seasonal/residual decomposition with |z|>2 flags
    # (detrended twin of dow_anomalies; exact integer micro-residuals)
    "seasonal_decompose": QuerySpec(
        pq.q_seasonal_decompose, pq.ORACLE_SEASONAL_DECOMPOSE
    ),
    # Kleinberg HITS hubs/authorities (two-sided ranking; L1-normalized
    # half-steps; unrolled-CTE oracle like pagerank_events)
    "hits_events": QuerySpec(gq.q_hits_events, gq.ORACLE_HITS_EVENTS),
    # survivorship merge: latest-non-null + modal rules per master key
    # (deterministic injected nulls; struct-max single aggregation)
    "golden_record": QuerySpec(pq.q_golden_record, pq.ORACLE_GOLDEN_RECORD),
    # real 24-bit BMP decode (both row orders, padding, BGR→RGB) with a
    # position-weighted checksum gate
    "media_bmp_decode": QuerySpec(
        xq.q_media_bmp_decode, xq.ORACLE_MEDIA_BMP_DECODE
    ),
    # media-dedup loop closed: dHash pairs → connected components →
    # family report (recursive-CTE closure over the pair arithmetic)
    "media_dhash_clusters": QuerySpec(
        xq.q_media_dhash_clusters, xq.ORACLE_MEDIA_DHASH_CLUSTERS
    ),
    # per-file bloom filters vs zone maps for POINT lookups on a
    # non-layout column (md5 bit positions — fully oracle-replayable)
    "bloom_skipping": QuerySpec(
        sc.q_bloom_skipping, sc.ORACLE_BLOOM_SKIPPING
    ),
    # measured bloom false-positive rate over guaranteed-absent probes
    # (the minhash_error pattern for the file-bloom index — r6)
    "bloom_fpp_audit": QuerySpec(
        sc.q_bloom_fpp_audit, sc.ORACLE_BLOOM_FPP_AUDIT
    ),
    # online EWMA/EWMAD control chart (O(1) state per key; streaming
    # twin pinned bit-identical; recursive-CTE recurrence oracle)
    "ewma_chart": QuerySpec(pq.q_ewma_chart, pq.ORACLE_EWMA_CHART),
    # AQP sample-and-scale with CLT confidence half-widths (md5 sample
    # ⇒ estimator, CI arithmetic, and verdicts all oracle-replayed)
    "aqp_group_estimate": QuerySpec(
        sc.q_aqp_group_estimate, sc.ORACLE_AQP_GROUP_ESTIMATE
    ),
    # bucketed co-located fact-fact join (bucketBy write → catalog read
    # → zero-exchange SMJ; oracle is the plain join, plan pytest-pinned)
    "bucketed_join": QuerySpec(sc.q_bucketed_join, sc.ORACLE_BUCKETED_JOIN),
    # bucketed zero-exchange AGGREGATION: groupBy on the bucket key of
    # a bucketed catalog table plans NO shuffle at all (pytest-pinned;
    # the groupBy twin of bucketed_join — r6)
    "bucketed_agg": QuerySpec(sc.q_bucketed_agg, sc.ORACLE_BUCKETED_AGG),
    # join-cardinality pre-flight: exact |A⋈B| from per-key counts
    # WITHOUT executing the join, plus the top-key skew share (r6)
    "join_cardinality_audit": QuerySpec(
        sc.q_join_cardinality_audit, sc.ORACLE_JOIN_CARDINALITY_AUDIT
    ),
    # incremental view under DELETES: Z-set sign-weighted delta merge
    # with retraction GC (drained groups vanish), checked against the
    # full recompute — the CDC extension of incremental_join_view (r6)
    "retraction_view": QuerySpec(
        sc.q_retraction_view, sc.ORACLE_RETRACTION_VIEW
    ),
    # incremental JOIN-view maintenance: ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB merged
    # onto the old snapshot ≡ full recompute (self-verdict column)
    "incremental_join_view": QuerySpec(
        sc.q_incremental_join_view, sc.ORACLE_INCREMENTAL_JOIN_VIEW
    ),
    # watermark policy decision table: per-type drop counts at each
    # candidate watermark (deterministic injected lateness)
    "watermark_audit": QuerySpec(
        xq.q_watermark_audit, xq.ORACLE_WATERMARK_AUDIT
    ),
    # --- round 7: shuffle-avoidance, robust stats, integer linalg, ER eval ---
    # bloom semi-join prefilter (sideways information passing): probe
    # rows drop BEFORE the join exchange; no-false-negative self-verdict
    "bloom_join_prefilter": QuerySpec(
        r7q.q_bloom_join_prefilter, r7q.ORACLE_BLOOM_JOIN_PREFILTER, headline=True
    ),
    # Theil-Sen median-of-slopes robust trend vs OLS on the same
    # calendar-bounded daily series
    "theilsen_trend": QuerySpec(r7q.q_theilsen_trend, r7q.ORACLE_THEILSEN_TREND),
    # exact-integer distributed power iteration: PC1 loading vector +
    # spectral-mass share (embedding-collapse diagnostic), K=6 rounds
    # replayed bit-for-bit by unrolled CTEs
    "power_iteration_pc1": QuerySpec(
        r7q.q_power_iteration_pc1, r7q.ORACLE_POWER_ITERATION_PC1, headline=True
    ),
    # precision/recall/F1 of the SNM JW linkage vs PLANTED truth
    # (deterministic identity damage) — the ER evaluation leg
    "linkage_quality": QuerySpec(r7q.q_linkage_quality, r7q.ORACLE_LINKAGE_QUALITY),
    # MP3 frame-header walk (ID3 syncsafe skip + length-arithmetic
    # landing) — the compressed-audio media-triage leg
    "media_mp3_probe": QuerySpec(
        r7q.q_media_mp3_probe, r7q.ORACLE_MEDIA_MP3_PROBE
    ),
    # manual skew-join splitting: heavy keys broadcast, light keys
    # shuffled, plain-join self-verdict — the join-side skew mitigation
    "skew_split_join": QuerySpec(
        r7q.q_skew_split_join, r7q.ORACLE_SKEW_SPLIT_JOIN, headline=True
    ),
    # per-vector diagonal Mahalanobis² outlier scores, exact-integer
    # per-dim z² ratios — the vector-level embedding QA leg
    "embedding_mahalanobis": QuerySpec(
        r7q.q_embedding_mahalanobis, r7q.ORACLE_EMBEDDING_MAHALANOBIS
    ),
    # Adamic-Adar missing-link prediction over the SNM JW linkage
    # graph with planted holes — the ER cluster-repair leg
    "link_prediction": QuerySpec(
        r7q.q_link_prediction, r7q.ORACLE_LINK_PREDICTION
    ),
    # exact 16-bucket equi-depth histogram (the CBO statistics
    # artifact) on the shared two-phase cumulative machinery
    "equi_depth_hist": QuerySpec(
        r7q.q_equi_depth_hist, r7q.ORACLE_EQUI_DEPTH_HIST
    ),
    # banding S-curve tuning table over the corpus's real verified
    # pair-similarity mass (micro-quantized expected detection)
    "lsh_param_sweep": QuerySpec(
        r7q.q_lsh_param_sweep, r7q.ORACLE_LSH_PARAM_SWEEP
    ),
    # RFM customer segmentation with deterministic rank-quartiles
    # (no NTILE ties, no percentile interpolation)
    "rfm_scores": QuerySpec(r7q.q_rfm_scores, r7q.ORACLE_RFM_SCORES),
    # --- round 8 ---
    # batch twin of the watermarked LEFT-OUTER stream-stream join
    # (r7 verdict #6: promote attribute_events_outer to the oracle
    # surface; streaming emission discipline stays pytest-pinned)
    "attribution_outer": QuerySpec(
        r8q.q_attribution_outer, r8q.ORACLE_ATTRIBUTION_OUTER
    ),
    # exact-integer Gini/Lorenz revenue concentration over the
    # two-phase tiebreak rank (the r8 cumulative extension)
    "revenue_gini": QuerySpec(r8q.q_revenue_gini, r8q.ORACLE_REVENUE_GINI),
}

# The external correctness driver differentials the FIRST 50 entries of
# ``queries()`` against DuckDB each round, so dict order decides which
# queries sit inside the standing hard gate. Rotation policy (r5+, per
# the r4 verdict): the window each round holds (a) every query whose
# implementation CHANGED this round, (b) every query REGISTERED this
# round — added in the same commit that registers it — and (c) a fill
# of queries that have never yet held a driver slot, oldest first, so
# all ~240 registered queries cycle through the standing hard gate
# within ~4 rounds. ``WINDOW_LEDGER.json`` (regenerated by
# ``scripts/update_window_ledger.py``, asserted by
# ``tests/test_window_ledger.py``) records which round each query last
# held a slot and schedules the not-yet-covered backlog.
# Registering a NEW query — checklist (every item in the SAME commit):
#   1. REGISTRY entry (fn + oracle SQL twin; alias every column both sides)
#   2. CORRECTNESS_WINDOW slot: displace a name from the END of this
#      list (the displaced name moves to the next round's schedule —
#      grow the schedule, not the debt)
#   3. ``python scripts/update_window_ledger.py`` to regenerate the ledger
#   4. Run the plan gates: ``pytest tests/test_plans.py`` — a designed
#      1-row-broadcast crossJoin needs a reviewed BNLJ_ALLOWED entry,
#      a calendar-bounded global window needs GLOBAL_WINDOW_ALLOWED
#      (r6 shipped ``bloom_fpp_audit`` past its own tripwire; don't repeat)
#   5. COVERAGE.md row + README query-count bump
#   6. scripts/scaling_audit.py AUDIT_QUERIES entry when the query has a
#      data-dependent join/pair-generation term
CORRECTNESS_WINDOW: list[str] = [
    # Round 8: the ledger's entire ``scheduled["8"]`` backlog — all 44
    # never-windowed names — rotated in (r7 verdict #1). With this
    # window green, every registered query has held a committed
    # driver-gate row: the full-registry horizon set in r5 closes.
    "frequent_ngrams", "quality_keepers", "join_explosion",
    "pmi_collocations", "ppl_buckets", "weekend_drift", "global_index",
    "corpus_card", "mutual_info", "suggest_rules", "pattern_profile",
    "jl_project", "cdc_state", "pareto_nations", "event_paths",
    "conversion_lag", "min_price_parts", "order_count_distribution",
    "top_supplier_revenue", "supplier_parts_excl",
    "large_volume_orders", "above_avg_suppliers", "idle_rich_customers",
    "forecast_revenue", "nation_trade_flows", "product_profit",
    "promo_revenue_share", "disjunctive_revenue", "market_share",
    "returned_customers", "ship_delay_priority", "quality_classifier",
    "classifier_calibration", "cluster_safe_split", "t_closeness",
    "kmeans_silhouette", "rater_kappa", "curriculum_shards",
    "quantile_norm", "conformal_threshold", "semantic_decontam",
    "dedup_triangles", "class_rebalance", "l_diversity",
    # (a) implementation CHANGED in r8 — re-gated per rotation policy:
    # rfm_scores re-planned onto bucketed_cumulative (r7 verdict #2),
    # link_prediction / bloom_join_prefilter linear-size broadcast
    # hints removed (r7 verdict #3), power_iteration_pc1 NULL-count
    # parity fix (r7 ADVICE #1).
    "rfm_scores", "link_prediction", "bloom_join_prefilter",
    "power_iteration_pc1",
    # (b) registered in r8, same-commit slot claims (displacing the
    # tfidf_cosine_pairs_capped / attribution re-gates — both already
    # hold multiple committed green rows; no debt grows).
    "attribution_outer", "revenue_gini",
]

assert len(CORRECTNESS_WINDOW) == 50, len(CORRECTNESS_WINDOW)
assert len(set(CORRECTNESS_WINDOW)) == 50
_missing = [n for n in CORRECTNESS_WINDOW if n not in REGISTRY]
assert not _missing, f"window names absent from registry: {_missing}"

REGISTRY = {
    **{name: REGISTRY[name] for name in CORRECTNESS_WINDOW},
    **{name: spec for name, spec in REGISTRY.items() if name not in set(CORRECTNESS_WINDOW)},
}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def headline_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.headline}

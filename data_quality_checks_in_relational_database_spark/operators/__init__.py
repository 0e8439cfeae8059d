from data_quality_checks_in_relational_database_spark.operators.anomaly import metric_anomalies
from data_quality_checks_in_relational_database_spark.operators.asof import asof_join
from data_quality_checks_in_relational_database_spark.operators.cluster import (
    connected_components,
    dedup_clusters,
    quality_representatives,
    removal_list,
)
from data_quality_checks_in_relational_database_spark.operators.anomaly import ewma_control_chart
from data_quality_checks_in_relational_database_spark.operators.diff import (
    categorical_drift,
    cdc_compact,
    checksum_reconcile,
    content_checksum,
    ks_two_sample,
    psi_report,
    schema_drift,
    snapshot_diff,
    snapshot_diff_summary,
    wasserstein_two_sample,
)
from data_quality_checks_in_relational_database_spark.operators.layout import (
    interleave_bits,
    zorder_key,
)
from data_quality_checks_in_relational_database_spark.operators.tokenizer import (
    bpe_encode_counts,
    bpe_train_merges,
)
from data_quality_checks_in_relational_database_spark.operators.profile import benford_report, mutual_information, pattern_profile, profile_table
from data_quality_checks_in_relational_database_spark.operators.skew import join_explosion_report, salted_join
from data_quality_checks_in_relational_database_spark.operators.checks import (
    FreshnessSpec,
    consistency_score,
    freshness_audit,
    reconcile,
    volume_audit,
)
from data_quality_checks_in_relational_database_spark.operators.cooccur import (
    cooccurrence_lift,
)
from data_quality_checks_in_relational_database_spark.operators.dedup import (
    cosine_neardup_pairs,
    cross_source_overlap,
    dedup_exact,
    dedup_exact_report,
    minhash_lsh_pairs,
    minhash_lsh_pairs_against,
    minhash_pairs_against_ledger,
    ngram_jaccard_pairs,
    normalize_text,
    normalized_dedup_report,
    simhash,
    simhash_pairs,
    write_minhash_ledger,
)
from data_quality_checks_in_relational_database_spark.operators.sketch import (
    cms_counters,
    cms_topk,
)
from data_quality_checks_in_relational_database_spark.operators.fanout import FanoutReport, run_fanout
from data_quality_checks_in_relational_database_spark.operators.funnel import (
    conversion_lag,
    funnel_report_windowed,
    top_event_paths,
)
from data_quality_checks_in_relational_database_spark.operators.fuzzy import blocked_fuzzy_pairs
from data_quality_checks_in_relational_database_spark.operators.interval import (
    close_pair_counts,
    close_pairs,
    overlap_join,
    overlap_pair_counts,
    overlap_pairs,
    overlap_stats,
    point_in_interval_join,
)
from data_quality_checks_in_relational_database_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
)
from data_quality_checks_in_relational_database_spark.operators.rules import evaluate_rules, suggest_rules, with_tolerance
from data_quality_checks_in_relational_database_spark.operators.completeness import (
    fd_violations,
    temporal_gaps,
)
from data_quality_checks_in_relational_database_spark.operators.packing import sliding_chunks
from data_quality_checks_in_relational_database_spark.operators.sampling import (
    deterministic_shuffle,
    stratified_sample_exact,
    global_row_index,
    stratified_sample_fraction,
    weighted_sample_exact,
)
from data_quality_checks_in_relational_database_spark.operators.similarity import (
    ann_topk_ivf,
    ann_topk_lsh,
    cosine_allpairs_blockjoin,
    cosine_topk,
    jl_project,
)
from data_quality_checks_in_relational_database_spark.operators.text import (
    bm25_topk,
    detect_language,
    fingerprint,
    frequent_ngrams,
    pmi_collocations,
    span_dedup_report,
    text_quality_report,
    top_terms_tfidf,
    unigram_lm_scores,
    winnowing_fingerprint,
)

__all__ = [
    "metric_anomalies",
    "benford_report",
    "blocked_fuzzy_pairs",
    "close_pair_counts",
    "close_pairs",
    "span_dedup_report",
    "snapshot_diff",
    "snapshot_diff_summary",
    "profile_table",
    "salted_join",
    "FreshnessSpec",
    "consistency_score",
    "freshness_audit",
    "reconcile",
    "volume_audit",
    "FanoutReport",
    "run_fanout",
    "asof_join",
    "evaluate_rules",
    "dedup_exact",
    "dedup_exact_report",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "cosine_neardup_pairs",
    "cosine_allpairs_blockjoin",
    "cosine_topk",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "temporal_gaps",
    "fd_violations",
    "stratified_sample_exact",
    "stratified_sample_fraction",
    "deterministic_shuffle",
    "detect_language",
    "fingerprint",
    "text_quality_report",
    "winnowing_fingerprint",
    "top_terms_tfidf",
    "frequent_ngrams",
    "cross_source_overlap",
    "quality_representatives",
    "overlap_pairs",
    "overlap_pair_counts",
    "overlap_stats",
    "overlap_join",
    "point_in_interval_join",
    "mutual_information",
    "suggest_rules",
    "with_tolerance",
    "pattern_profile",
    "jl_project",
    "cdc_compact",
    "top_event_paths",
    "conversion_lag",
    "funnel_report_windowed",
    "join_explosion_report",
    "pmi_collocations",
    "global_row_index",
    "categorical_drift",
    "connected_components",
    "dedup_clusters",
    "removal_list",
    "psi_report",
    "ks_two_sample",
    "wasserstein_two_sample",
    "content_checksum",
    "checksum_reconcile",
    "schema_drift",
    "ewma_control_chart",
    "interleave_bits",
    "zorder_key",
    "bpe_train_merges",
    "bpe_encode_counts",
    "minhash_lsh_pairs_against",
    "minhash_pairs_against_ledger",
    "write_minhash_ledger",
    "sliding_chunks",
    "weighted_sample_exact",
    "bm25_topk",
    "unigram_lm_scores",
    "documents_as_media",
    "extract_features",
    "cms_counters",
    "cms_topk",
    "cooccurrence_lift",
    "normalize_text",
    "normalized_dedup_report",
]

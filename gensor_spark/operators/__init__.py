from gensor_spark.operators.points import (
    docs_to_points,
    points_to_docs,
    events_to_points,
    POINTS_COLUMNS,
)
from gensor_spark.operators.resample import resample, FREQ_SECONDS
from gensor_spark.operators.rollup import rollup_tier, cascade_tier, finalize_tier
from gensor_spark.operators.asof import asof_join
from gensor_spark.operators.decontaminate import contamination_stats
from gensor_spark.operators.qualityfilter import (
    c4_line_filter,
    gopher_quality_flags,
)
from gensor_spark.operators.cmsketch import (
    cascade_cms,
    estimate_cms,
    merge_cms,
    rollup_cms,
)
from gensor_spark.operators.distinctrollup import (
    cascade_distinct,
    finalize_distinct,
    rollup_distinct,
)
from gensor_spark.operators.classifier import (
    hashed_features,
    score_quality,
    train_quality_classifier,
)
from gensor_spark.operators.esd import (
    gesd_outliers,
    seasonal_esd,
    t_ppf,
)
from gensor_spark.operators.corpusprep import corpus_prep
from gensor_spark.operators.slo import burn_rate, multiwindow_burn_alerts
from gensor_spark.operators.spectral import (
    anomaly_episodes,
    dominant_period,
    spectral_residual,
)
from gensor_spark.operators.matrixprofile import (
    matrix_profile,
    pattern_search,
    top_discords,
    top_motifs,
)
from gensor_spark.operators.ddsketch import (
    cascade_dd,
    dd_quantize,
    quantiles_from_dd,
    rollup_dd,
    rollup_dd_quantiles,
)
from gensor_spark.operators.topkrollup import (
    cascade_topk,
    finalize_topk,
    merge_topk,
    rollup_topk,
)
from gensor_spark.operators.intervaljoin import (
    interval_join,
    interval_union_length,
)
from gensor_spark.operators.seriesstats import (
    acf,
    ccf,
    counter_rate,
    cusum_changepoint,
    ewma,
    ewma_halflife,
    holt_smooth,
    ar_forecast,
    hw_forecast,
    hw_smooth,
    ks_split,
    mann_kendall,
    pacf,
    seasonal_anomaly,
    seasonal_decompose,
    rolling_corr,
    series_corr,
    smoother_backtest,
    theta_forecast,
)
from gensor_spark.operators.drift import (
    psi_numeric,
    psi_vs_reference,
    vocab_jsd,
)
from gensor_spark.operators.dtw import dtw_pairs, paa_sketch
from gensor_spark.operators.sax import sax_motif_candidates, sax_words
from gensor_spark.operators.cvsplit import purged_time_folds
from gensor_spark.operators.pelt import pelt_changepoints, segmented_trend
from gensor_spark.operators.spandedup import trim_duplicate_spans
from gensor_spark.operators.shards import (
    assign_shards,
    shard_manifest,
    write_shards,
)
from gensor_spark.operators.overlap import source_ngram_sketches, source_overlap
from gensor_spark.operators.kalman import kalman_smooth
from gensor_spark.operators.unigramlm import unigram_encode, unigram_train
from gensor_spark.operators.funnel import window_funnel
from gensor_spark.operators.twa import time_weighted_avg
from gensor_spark.operators.bpe import bpe_encode, bpe_train
from gensor_spark.operators.retrieval import bm25_topk
from gensor_spark.operators.pii import scrub_pii
from gensor_spark.operators.dsir import dsir_logweights, dsir_select
from gensor_spark.operators.histquantiles import (
    cascade_hist,
    merge_hist,
    quantiles_from_hist,
    rollup_hist,
    rollup_hist_docs_arrow,
    rollup_quantiles,
)
from gensor_spark.operators.plotdata import (
    coverage_segments,
    lttb_downsample,
    m4_downsample,
    outlier_overlay,
)

__all__ = [
    "dd_quantize",
    "rollup_dd",
    "cascade_dd",
    "quantiles_from_dd",
    "rollup_dd_quantiles",
    "docs_to_points",
    "points_to_docs",
    "events_to_points",
    "POINTS_COLUMNS",
    "resample",
    "FREQ_SECONDS",
    "rollup_tier",
    "cascade_tier",
    "finalize_tier",
    "asof_join",
    "contamination_stats",
    "c4_line_filter",
    "gopher_quality_flags",
    "bm25_topk",
    "scrub_pii",
    "dsir_logweights",
    "dsir_select",
    "sax_words",
    "sax_motif_candidates",
    "purged_time_folds",
    "pelt_changepoints",
    "segmented_trend",
    "trim_duplicate_spans",
    "assign_shards",
    "shard_manifest",
    "write_shards",
    "source_ngram_sketches",
    "source_overlap",
    "kalman_smooth",
    "ewma_halflife",
    "unigram_encode",
    "unigram_train",
    "interval_join",
    "interval_union_length",
    "acf",
    "ccf",
    "ewma",
    "holt_smooth",
    "hw_smooth",
    "hw_forecast",
    "ar_forecast",
    "rollup_cms",
    "cascade_cms",
    "merge_cms",
    "estimate_cms",
    "theta_forecast",
    "ks_split",
    "psi_numeric",
    "psi_vs_reference",
    "vocab_jsd",
    "window_funnel",
    "time_weighted_avg",
    "bpe_train",
    "bpe_encode",
    "dtw_pairs",
    "paa_sketch",
    "pacf",
    "series_corr",
    "cusum_changepoint",
    "mann_kendall",
    "rollup_distinct",
    "cascade_distinct",
    "finalize_distinct",
    "rollup_topk",
    "cascade_topk",
    "merge_topk",
    "finalize_topk",
    "counter_rate",
    "seasonal_anomaly",
    "seasonal_decompose",
    "smoother_backtest",
    "rollup_hist",
    "rollup_hist_docs_arrow",
    "merge_hist",
    "cascade_hist",
    "quantiles_from_hist",
    "rollup_quantiles",
    "m4_downsample",
    "lttb_downsample",
    "outlier_overlay",
    "coverage_segments",
]

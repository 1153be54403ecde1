"""Query modules — importing each module registers its queries.

Keep this list in sync with SURVEY.md §2's inventory sections.

Registration order doubles as the driver's verification order: round 1's
CORRECTNESS file covered exactly the first 50 registered queries, so
``_VERIFY_FIRST`` rotates queries without a driver-green row yet into that
window.  Round 1 verified (49 pass + 1 no_oracle): the aggregates, scans,
project/filter, setops, scalar-fn, join, and rank/lag window families —
those now register last; their round-1 rows stand in CORRECTNESS_r01.json.
"""

from __future__ import annotations

import importlib

_MODULES = [
    "aggregates",
    "scans",
    "filters",
    "setops",
    "scalar",
    "joins",
    "windows",
    "stream_windows",
    "llm",
    "udfs",
    "catalog_q",
    "tpch",
    "timeseries",
    "scale",
    "scalar2",
    "misc",
    "sampling",
    "quality_q",
    "tpch2",
    "llm2",
    "reshape",
    "matching",
]

# Queries that should occupy the front of the registry this round — rounds
# 1+2 together drove 100 distinct registry entries green; this rotation
# covers the 29 entries never inside the driver's 50-slot window plus 21 of
# the 22 queries new in round 3. First-time checks outrank re-checks: with
# 51 first-timers and 50 slots, the one left out is q_text_bpe_train, whose
# driver check would be rows-only anyway (iterative, no SQL oracle) and
# whose merge sequence is pinned exactly in tests/test_llm_ops.py.
# Order within the list = expected driver check order.
_VERIFY_FIRST = [
    # --- the 29 never-driver-checked entries (VERDICT r2 "Next round" #1)
    "q_scd2", "q_merge_upsert", "q_sql_transform",
    "q_subquery_scalar", "q_subquery_correlated",
    "q_ts_gapfill",
    "q_agg_percentile", "q_agg_approx_percentile", "q_agg_salted", "q_agg_stats",
    "q_fn_string2", "q_fn_bitwise", "q_fn_map",
    "q_explode_outer", "q_filter_not_in_nulls", "q_window_percent_rank",
    "q_catalog_list_tables", "q_catalog_table_schema",
    "q_catalog_list_columns", "q_catalog_fk_graph",
    "q_sanitize_nulls", "q_sink_append", "q_sink_replace",
    "q_profile_columns", "q_quality_checks",
    "q_dedup_near", "q_dedup_simhash", "q_dedup_embedding", "q_sim_ann",
    # --- new in round 3 (10)
    "q_multimodal_decode", "q_dedup_embedding_planted",
    "q_dedup_clusters", "q_dedup_keep",
    "q_join_range_bucketed", "q_ts_sessionize", "q_ts_rollup", "q_funnel",
    "q_quality_outliers",
    # --- new in round 3, second batch (12, exact oracles)
    "q_doc_chunk", "q_pack_concat", "q_pii_redact", "q_text_bigrams",
    "q_unpivot", "q_histogram", "q_agg_filtered", "q_agg_mode_median",
    "q_window_cume_dist", "q_cdc_apply", "q_ts_interpolate",
    "q_join_skew_salted",
]

_loaded = False


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for m in _MODULES:
        importlib.import_module(f"{__name__}.{m}")
    _reorder()
    _loaded = True


def _reorder() -> None:
    """Rebuild the registry dict so ``_VERIFY_FIRST`` names come first (in
    list order), then everything else in original registration order."""
    from etl_open_source_spark.registry import REGISTRY

    # A typo or query rename must fail loudly, not silently shrink the
    # driver's verification window (ADVICE r2).
    unknown = [n for n in _VERIFY_FIRST if n not in REGISTRY]
    assert not unknown, f"_VERIFY_FIRST names not in REGISTRY: {unknown}"
    assert len(_VERIFY_FIRST) == len(set(_VERIFY_FIRST)) == 50, (
        f"_VERIFY_FIRST must hold exactly the driver's 50 window slots, "
        f"got {len(_VERIFY_FIRST)}"
    )
    front = {n: REGISTRY[n] for n in _VERIFY_FIRST}
    rest = {n: qd for n, qd in REGISTRY.items() if n not in front}
    REGISTRY.clear()
    REGISTRY.update(front)
    REGISTRY.update(rest)

"""Query modules — importing each module registers its queries.

Keep this list in sync with SURVEY.md §2's inventory sections.

Registration order doubles as the driver's verification order: each
round's CORRECTNESS file covers exactly the first 50 registered queries,
so ``_VERIFY_FIRST`` (exactly 50 names, asserted) selects that window.
Policy, in priority order: (1) queries never yet inside a driver window,
(2) queries whose code changed after their last green row, (3) queries
fixed this round, (4) re-checks of the oldest evidence. Every rotation
is pre-verified locally against DuckDB at sf0.01 before the round ends
(round 5: all 50 green — 47 exact, 3 rows-only by design: the HLL
rollup, CMS sketch, and iterative BPE trainer).
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
    "llm3",
]

# Round-5 rotation. First-time checks outrank re-checks; then rows whose
# latest evidence predates a refactor; then fixed-this-round rows; the
# remaining slots re-check the oldest (round-1) evidence.
# Order within the list = expected driver check order.
_VERIFY_FIRST = [
    # --- the 9 entries never inside any driver window (VERDICT r4 item 4)
    "q_agg_hll_merge", "q_fn_lambda", "q_fn_variant", "q_fuzzy_match",
    "q_layout_zorder", "q_sink_orc_roundtrip", "q_text_bpe_step",
    "q_text_bpe_train", "q_text_tfidf",
    # --- fixed this round (oracle HUGEINT cast; NTZ-safe epoch cast)
    "q_ts_sessionize", "q_window_range_frame",
    # --- refactored in round 3 after their last green row (ADVICE r4):
    #     asof rewrite 3f6e73d, hashed-shingle ngram rework
    "q_join_asof", "q_dedup_ngram",
    # --- new in round 5 (curation + multimodal, queries/llm3.py)
    "q_text_decontaminate", "q_text_dup_ngram_frac", "q_embedding_quantize",
    "q_mix_domains", "q_text_entropy",
    "q_multimodal_resize", "q_multimodal_framesample", "q_sim_knn_graph",
    "q_url_normalize", "q_agg_argmax", "q_ts_resample_ohlc", "q_text_lm_score",
    "q_quality_fk", "q_multimodal_audio_chunks",
    "q_intersect_all", "q_except_all", "q_agg_corr", "q_fn_regex",
    "q_scan_text", "q_join_asof_forward", "q_agg_cms", "q_recursive_cte",
    "q_fn_date2", "q_fn_null_pack",
    # --- re-checks: oldest (round-1) evidence, in registration order
    "q_scan_parquet", "q_scan_csv", "q_scan_json",
    "q_sink_parquet_roundtrip", "q_sink_csv_roundtrip",
    "q_project_select", "q_project_rename", "q_project_computed",
    "q_filter_compare", "q_filter_in",
    "q_join_inner", "q_join_left", "q_join_right",
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

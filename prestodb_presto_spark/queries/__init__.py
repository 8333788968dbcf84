"""Query catalog: every operator claimed in SURVEY.md §2 has an entry here.

Each entry pairs a Spark implementation (``(spark, sf_dir) -> DataFrame``)
with an ANSI-SQL oracle string DuckDB can run on the same parquet tables.
The driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json) — so
column names/ordering must match exactly, and floating results must be
made deterministic (see queries.determinism notes).

Modules self-register via the @query decorator at import time.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver falls back to rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation in the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, spark_fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


# Catalog emission order: the driver evaluates queries() in dict order and
# samples a ~50-query prefix per round.  After rounds 1-3 every catalog name
# has a driver row; 129/131 are green on their latest sample.  Emission
# order: (a) the two r3 FAILs (tpch_q12, types_decimal_arithmetic — the only
# oracles whose DuckDB results surfaced as decimal128/hugeint arrow columns,
# which the driver canonicalizes differently from Spark's collected values;
# both now emit driver-safe int64/string outputs) first for re-sampling,
# then (b) any name with no green row yet (new queries land here
# automatically, round-robin across families), then (c) the green names.
_STALE_DRIVER_FAILS = (
    "tpch_q12",
    "types_decimal_arithmetic",
)

# Names green on their latest driver sample (CORRECTNESS_r01 ∪ r02 ∪ r03).
_DRIVER_GREEN = frozenset({
    "agg_any_value", "agg_approx_distinct", "agg_approx_percentile",
    "agg_array_agg", "agg_array_agg_ordered", "agg_bitwise", "agg_bool",
    "agg_checksum", "agg_corr_regr", "agg_count_if", "agg_cube",
    "agg_empty_input", "agg_filter_clause", "agg_geometric_mean",
    "agg_global", "agg_grouping_sets", "agg_histogram", "agg_hll_sketch",
    "agg_map_agg", "agg_min_max_by", "agg_min_max_n", "agg_multi_distinct",
    "agg_numeric_histogram", "agg_rollup", "agg_set_digest",
    "agg_stats_moments", "assign_unique_id", "conditional_exprs",
    "cte_chain", "cte_reused_twice", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "distinct_limit",
    "events_dedup_latest", "events_hierarchical_rollup",
    "events_interval_join", "events_json_extract", "events_session_window",
    "events_sliding_window", "events_tumbling_window", "fn_array_ops",
    "fn_binary_hash", "fn_conditional_ops", "fn_datetime_ops",
    "fn_geo_bing_tiles", "fn_geo_ops", "fn_geo_polygon_ops",
    "fn_geo_set_ops", "fn_json_ops", "fn_math_ops", "fn_regexp_ops",
    "fn_string_ops", "join_anti", "join_asof", "join_broadcast_explicit",
    "join_cross", "join_full_outer", "join_inequality_range", "join_inner",
    "join_left_outer", "join_not_in_null_semantics", "join_null_safe_eq",
    "join_outer_on_vs_where", "join_right_outer", "join_semi",
    "join_skew_salted", "join_spatial_contains", "join_spatial_grid",
    "join_theta", "lateral_top1_per_group", "multimodal_decode_features",
    "multimodal_frame_sample", "orderby_limit_topn",
    "orderby_nulls_placement", "pivot_conditional", "sample_bernoulli",
    "setop_except", "setop_except_all", "setop_intersect",
    "setop_intersect_all", "setop_union_all", "setop_union_distinct",
    "similarity_embedding_stats", "similarity_knn_top1",
    "similarity_lsh_ann", "similarity_threshold_pairs",
    "subquery_in_uncorrelated", "subquery_quantified_all",
    "subquery_quantified_any", "subquery_scalar_correlated",
    "subquery_scalar_empty", "text_fingerprint", "text_langid_heuristic",
    "text_quality_score", "text_token_stats", "tpch_q01", "tpch_q02",
    "tpch_q03", "tpch_q04", "tpch_q05", "tpch_q06", "tpch_q07", "tpch_q08",
    "tpch_q09", "tpch_q10", "tpch_q11", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20", "tpch_q21",
    "tpch_q22", "types_time_ops", "unnest_explode", "unnest_map",
    "unnest_with_ordinality", "values_inline", "window_offsets",
    "window_partition_total", "window_range_frame", "window_ranking",
    "window_running_agg", "window_topn_per_group",
})
_FAMILY_ORDER = (
    "tpch",
    "agg",
    "window",
    "join",
    "fn",
    "rel",
    "setop",
    "subq",
    "events",
    "text",
    "dedup",
    "similarity",
    "multimodal",
)


def _family(name: str) -> str:
    head = name.split("_", 1)[0]
    if head in {"tpch", "agg", "window", "join", "fn", "setop", "events", "text",
                "dedup", "similarity", "multimodal"}:
        return head
    if head in {"subquery", "cte", "lateral"}:
        return "subq"
    return "rel"  # values/unnest/sample/orderby/distinct/assign/types/conditional/pivot


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY); return the
    catalog interleaved round-robin across operator families."""
    from prestodb_presto_spark.queries import (  # noqa: F401
        aggregates,
        functions_q,
        joins,
        multimodal_q,
        relational,
        setops,
        similarity_q,
        streaming_batch,
        textops,
        tpch,
        windows_q,
    )

    def round_robin(names: list[str]) -> list[str]:
        buckets: dict[str, list[str]] = {fam: [] for fam in _FAMILY_ORDER}
        for name in names:
            buckets[_family(name)].append(name)
        out: list[str] = []
        rank = 0
        while len(out) < len(names):
            for fam in _FAMILY_ORDER:
                if rank < len(buckets[fam]):
                    out.append(buckets[fam][rank])
            rank += 1
        return out

    stale = [n for n in _STALE_DRIVER_FAILS if n in REGISTRY]
    taken = set(stale)
    unverified = [n for n in REGISTRY if n not in _DRIVER_GREEN and n not in taken]
    verified = [n for n in REGISTRY if n in _DRIVER_GREEN and n not in taken]
    ordered = stale + round_robin(unverified) + round_robin(verified)
    return {n: REGISTRY[n] for n in ordered}

"""Driver-facing query catalog: named queries + DuckDB oracle SQL.

Each catalog module registers queries with :func:`register`; the driver
contract (``__spark_entry__.py``) exposes ``REGISTRY`` as ``queries()`` /
``oracle_sql()``. Every query takes ``(spark, sf_dir)`` and returns a
DataFrame whose column names match its oracle exactly (the driver sorts
columns by name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""  # reference citation / operator coverage note


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The driver's correctness gate samples the FIRST 50 entries of ``queries()``
# in registration order.  The head rotates every round so no query goes
# unverified for long: never-driver-checked queries first, then queries whose
# last green row is oldest, then anything whose implementation changed this
# round (a green history does not cover new code).
#
# Round-6 head: the 10 never-checked queries (the recall-telemetry pair +
# bloom_decontaminate / events_anomaly_zscore_bucketed / doc_dup_span_stats /
# simhash_hamming_pairs / dedup_jaccard_prefix / incremental_dedup /
# bm25_topk / cosine_topk_pq, all new this round), all 13 queries last checked in r3 (the stale set the
# r5 verdict scheduled for this head), the 7 queries whose implementation
# changed this round (LSH materialization + parallelism guard, then the
# late-round composed-hash rewrite of minhash_signatures_portable:
# dedup_minhash_lsh / dedup_lsh_portable / dedup_clusters_lsh /
# corpus_boilerplate_3gram / decontaminate_ngram; NULL-quality exclusion:
# quality_percentile_gate; report floors: ml_energy_report —
# ml_peak_classification got the same floors and is already in the r3 set;
# the other late-round rewrites are all in the never-checked head group),
# and 20 of the 47 remaining queries last checked in r4.  Deferred to round
# 7 (27): the 19 r4-green TPC-H-style relational queries whose machinery —
# broadcast dim joins, partial aggs, decimal-detour sums,
# TakeOrderedAndProject — is plan-asserted and exercised in-head by
# orders_cube / weighted_median_price / customer_year_setops /
# events_pivot_by_type / league_table / user_purchase_totals
# (above_nation_avg_customers, brand_revenue, customers_with_open_orders,
# customers_without_orders, disjunctive_brand_revenue,
# distinct_users_per_type, doc_chunks, large_volume_orders, metrics_union,
# null_handling_metrics, orders_rollup, promo_revenue_pct, regional_revenue,
# returned_items_top20, sales_per_year, shipping_priority_top10,
# supplier_return_ratio, top5_orders, top_priority_null_count), plus 3 more
# r4-green queries displaced by the new-query head whose families keep
# in-head representatives: events_sliding_10m_5m (events_tumbling_10m),
# events_multi_rollup (orders_cube), embedding_stats (cosine_topk /
# label_centroids array HOFs), event_props_json (event_props_variant),
# user_rolling_stats (events_trailing_hour_sum + value_quantiles_by_type
# cover the per-entity window family), approx_distinct_users_rollup
# (rows-only HLL; its error bound is pytest-gated and the rollup shape is
# covered in-head by orders_cube), cyclic_prediction_rates (M7 custom
# evaluators; ml_eval_metrics r5-green gates the evaluator arithmetic),
# label_centroids (array-HOF family covered in-head by cosine_topk /
# cosine_topk_ivf / cosine_topk_pq).  These 27 lead the r7 head.
DRIVER_SAMPLE_HEAD: tuple[str, ...] = (
    # never driver-checked (10, new this round)
    "lsh_recall_telemetry",
    "ivf_recall_telemetry",
    "bloom_decontaminate",
    "events_anomaly_zscore_bucketed",
    "doc_dup_span_stats",
    "simhash_hamming_pairs",
    "dedup_jaccard_prefix",
    "incremental_dedup",
    "bm25_topk",
    "cosine_topk_pq",
    # last checked r3 (13 — the full stale set)
    "binary_media_inventory",
    "cosine_topk_lsh",
    "customer_year_setops",
    "doc_path_format",
    "docs_stratified_sample",
    "events_pivot_by_type",
    "events_trailing_hour_sum",
    "jsonl_media_groups",
    "ml_peak_classification",
    "nation_name_fuzzy",
    "orders_cube",
    "pii_redaction",
    "weighted_median_price",
    # implementation changed this round (green history doesn't cover it)
    "dedup_minhash_lsh",
    "dedup_lsh_portable",
    "dedup_clusters_lsh",
    "corpus_boilerplate_3gram",
    "decontaminate_ngram",
    "quality_percentile_gate",
    "ml_energy_report",
    # last checked r4 (20 of 47)
    "cosine_topk",
    "cosine_topk_ivf",
    "dedup_clusters_jaccard",
    "dedup_exact",
    "dedup_survivors",
    "doc_normalized_fingerprint",
    "doc_rolling_hash",
    "doc_simhash_portable",
    "doc_token_stats",
    "event_props_variant",
    "event_value_trend",
    "events_gapfill_5m",
    "events_tumbling_10m",
    "png_decode_stats",
    "quality_by_source",
    "supplier_stats_salted",
    "value_quantiles_by_type",
    "league_table",
    "order_ship_lag_30d",
    "user_purchase_totals",
)


def load_catalog() -> dict[str, Query]:
    """Import all catalog modules (side-effect: fills REGISTRY).

    The returned dict is reordered so that :data:`DRIVER_SAMPLE_HEAD` comes
    first — the driver correctness gate checks the first 50 registered
    queries, and this ordering makes that sample span every catalog module.
    """
    from . import catalog_relational  # noqa: F401
    from . import catalog_arrays  # noqa: F401
    from . import catalog_text  # noqa: F401
    from . import catalog_events  # noqa: F401
    from . import catalog_intervals  # noqa: F401
    from . import catalog_ml  # noqa: F401
    from . import catalog_sources  # noqa: F401
    from . import catalog_llm  # noqa: F401
    from . import catalog_corpus  # noqa: F401
    from . import catalog_analytics  # noqa: F401

    head = [n for n in DRIVER_SAMPLE_HEAD if n in REGISTRY]
    ordered = {n: REGISTRY[n] for n in head}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered

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
# unverified for long: never-driver-checked queries first, then anything
# whose implementation changed this round (a green history does not cover
# new code), then queries whose last green row is oldest.
#
# Round-7 head (catalog = 131 after the SemDeDup trio + jpeg_decode_stats
# + the dedup_semantic_kmeans production path + paragraph_dedup_stats
# + dsir_affinity_top64 + bpe_merge_top32 + incremental_semantic_dedup):
# the 9 never-checked queries; the 9 whose implementation changed this
# round (trail_nn gate: events_anomaly_zscore_bucketed; histogram-level
# NULL exclusion: quality_percentile_gate; in-join length + suffix-bound
# filter: dedup_jaccard_prefix; zero-norm guard in twin AND oracle:
# cosine_topk_pq; dual shuffle hint: simhash_hamming_pairs; jpg fixtures +
# glob: binary_media_inventory; bloom_position delegation: bloom_
# decontaminate; hashed shingle stream: incremental_dedup AND
# decontaminate_ngram); ALL 27 queries last checked in r4 (the set the r6
# verdict scheduled for this head); and the first 5 (alphabetical) of
# the 45 queries last checked in r5 (click_purchase_attribution ...
# daily_conversion_funnel, with ml_eval_metrics swapped in for
# embedding_near_dup so the head spans catalog_ml — the module-coverage
# contract).  The remaining 40 r5-checked queries
# (data_mix_by_source onward) lead the r8 head, followed by the
# r6-checked set as it ages.
DRIVER_SAMPLE_HEAD: tuple[str, ...] = (
    # never driver-checked (9, new this round)
    "dedup_semantic",
    "dedup_semantic_survivors",
    "semantic_recall_telemetry",
    "jpeg_decode_stats",
    "dedup_semantic_kmeans",
    "paragraph_dedup_stats",
    "dsir_affinity_top64",
    "bpe_merge_top32",
    "incremental_semantic_dedup",
    # implementation changed this round (green history doesn't cover it)
    "events_anomaly_zscore_bucketed",
    "quality_percentile_gate",
    "dedup_jaccard_prefix",
    "cosine_topk_pq",
    "simhash_hamming_pairs",
    "binary_media_inventory",
    "bloom_decontaminate",
    "incremental_dedup",
    "decontaminate_ngram",
    # last checked r4 (all 27)
    "above_nation_avg_customers",
    "approx_distinct_users_rollup",
    "brand_revenue",
    "customers_with_open_orders",
    "customers_without_orders",
    "cyclic_prediction_rates",
    "disjunctive_brand_revenue",
    "distinct_users_per_type",
    "doc_chunks",
    "embedding_stats",
    "event_props_json",
    "events_multi_rollup",
    "events_sliding_10m_5m",
    "label_centroids",
    "large_volume_orders",
    "metrics_union",
    "null_handling_metrics",
    "orders_rollup",
    "promo_revenue_pct",
    "regional_revenue",
    "returned_items_top20",
    "sales_per_year",
    "shipping_priority_top10",
    "supplier_return_ratio",
    "top5_orders",
    "top_priority_null_count",
    "user_rolling_stats",
    # last checked r5 (first 5 alphabetically of 45; data_mix_by_source,
    # dedup_ngram_jaccard, distinct_status_priority, doc_regex_tokens,
    # doc_simhash, doc_tfidf_top_terms and docs_hash_sample yielded their
    # slots to the five queries added and two rewritten mid-round and
    # lead the r8 head)
    "click_purchase_attribution",
    "cms_token_counts",
    "csv_sales_publisher_year",
    "daily_conversion_funnel",
    "ml_eval_metrics",
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

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
# Round-12 head (catalog = 217): the nine never-checked round-12
# additions first (PDF extraction, the Content-Type dispatch, the
# q-digest quantile sketch, the mixed-payload WARC capstone, the HTTP
# body-decoding gate, the link-graph PageRank capstone, the fastText-shape
# classifier gate, the CDX capture index, the WAT
# metadata export); then the
# eight queries whose implementation
# changed this round (the robots parser's RFC 9309 conformance fixes —
# anchor-excluded spec, unknown fields no longer splitting groups — gate
# robots_crawl_filter, and the HTML extractor's per-line anchor
# accounting + in-anchor block separator touch every parse_html
# consumer); then the ENTIRE 22-query r7-stale cohort (the oldest last-
# green rows in the catalog — the r11 verdict's rotation ask); then 7
# of the oldest r8-cohort queries in registration order, with the last
# four slots reserved for module coverage (the contract test requires
# every catalog module in the first 50): the stalest catalog_arrays /
# catalog_text / catalog_intervals / catalog_ml entries
# (cosine_topk_ivfpq r8, cross_source_dup_matrix r8,
# plusminus_player_stats r8, ml_energy_report r9). After this round
# every query's last driver check is r8 or newer.
DRIVER_SAMPLE_HEAD: tuple[str, ...] = (
    # never driver-checked (new this round)
    "pdf_text_extract_stats",
    "doc_extract_dispatch_stats",
    "qdigest_event_quantiles",
    "mixed_crawl_extract_stats",
    "http_encoding_stats",
    "crawl_link_pagerank",
    "quality_classifier_gate",
    "cdx_index_stats",
    "wat_export_stats",
    # implementation changed this round
    "robots_crawl_filter",
    "html_text_extract_stats",
    "html_main_content_stats",
    "html_charset_stats",
    "crawl_quality_mix",
    "crawl_to_wet_pipeline",
    "crawl_text_pipeline",
    "crawl_health_stats",
    # last driver-checked r7 (all 22)
    "orders_rollup",
    "customers_with_open_orders",
    "customers_without_orders",
    "distinct_users_per_type",
    "regional_revenue",
    "shipping_priority_top10",
    "above_nation_avg_customers",
    "returned_items_top20",
    "promo_revenue_pct",
    "large_volume_orders",
    "quality_percentile_gate",
    "incremental_dedup",
    "paragraph_dedup_stats",
    "events_sliding_10m_5m",
    "approx_distinct_users_rollup",
    "cyclic_prediction_rates",
    "user_rolling_stats",
    "events_multi_rollup",
    "csv_sales_publisher_year",
    "doc_chunks",
    "bpe_merge_top32",
    "daily_conversion_funnel",
    # oldest of the r8 cohort, registration order
    "bination_trade_volume",
    "small_quantity_revenue",
    "sole_return_supplier",
    "idle_customer_balance",
    "nation_market_share",
    "top_revenue_supplier",
    "cheapest_supplier_per_part",
    # module-coverage slots (stalest entry of each remaining module)
    "cosine_topk_ivfpq",
    "cross_source_dup_matrix",
    "plusminus_player_stats",
    "ml_energy_report",
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

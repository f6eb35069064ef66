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
# Round-13 head (catalog = 238): the 4 never-driver-checked round-13
# additions first (WARC request/response pairing, the multi-class
# language-ID classifier, the crawl composition that replaces the
# predict_lang heuristic with it, ISO 28500 segment reassembly); then
# every query whose
# implementation changed this round — the Gopher tokenization fix
# (empty tokens dropped), the sitemap fixture XML escaping, the JVM
# URL-resolution fast path (page_links / resolve_redirects consumers),
# the PDF 1.5 profile (ObjStm/xref-stream/predictor/font legs in the
# extraction fixtures), and the warc_records schema growth
# (record_id/concurrent_to/user-agent/referer — every consumer
# re-verifies); then the FULL r7-stale cohort (11, promised last
# round) and the oldest r8 rows, with the stalest catalog_ml and
# catalog_intervals entries holding the module-coverage contract
# (every module in the first 50). After this head lands, no catalog
# query's last green row predates r8.
DRIVER_SAMPLE_HEAD: tuple[str, ...] = (
    # never driver-checked (round-13 additions)
    "warc_request_pairing_stats",
    "lang_classifier_gate",
    "crawl_lang_classifier_mix",
    "warc_segment_reassembly",
    # implementation changed this round
    "gopher_quality_stats",
    "sitemap_frontier_stats",
    "crawl_discovery_pipeline",
    "crawl_link_pagerank",
    "redirect_resolution_stats",
    "pdf_text_extract_stats",
    "doc_extract_dispatch_stats",
    "mixed_crawl_extract_stats",
    "warc_crawl_stats",
    "warc_domain_stats",
    "crawl_health_stats",
    "http_encoding_stats",
    "cdx_index_stats",
    "wat_export_stats",
    "warc_revisit_roundtrip",
    "warc_revisit_resolve_stats",
    "crawl_to_wet_pipeline",
    "crawl_text_pipeline",
    "crawl_quality_mix",
    "wet_export_roundtrip",
    "cdx_recrawl_diff",
    "robots_crawl_filter",
    # r7-stale cohort (all 11 — the rotation promised in the r12 head)
    "events_sliding_10m_5m",
    "approx_distinct_users_rollup",
    "user_rolling_stats",
    "events_multi_rollup",
    "daily_conversion_funnel",
    "doc_chunks",
    "csv_sales_publisher_year",
    "cyclic_prediction_rates",
    "incremental_dedup",
    "paragraph_dedup_stats",
    "bpe_merge_top32",
    # oldest r8 rows + module-coverage slots (catalog_ml, catalog_intervals)
    "binary_media_inventory",
    "bination_trade_volume",
    "bpe_encode_stats",
    "bpe_train_merges",
    "cheapest_supplier_per_part",
    "copurchase_pagerank",
    "customer_order_distribution",
    "dedup_containment_pairs",
    "dedup_semantic_hier",
    "doc_dup_spans_merged",
    "doc_winnow_stats",
    "ml_eval_metrics",
    "purchase_prior_state_pit",
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

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
# Round-12 head (catalog = 234): ALL 26 never-driver-checked round-12
# additions first — the 9 early-round gates (PDF extraction,
# Content-Type dispatch, q-digest, mixed-payload capstone, HTTP body
# decoding, link-graph PageRank, fastText-shape classifier, CDX index,
# WAT export) and the 17 late-round gates (redirect resolution, sitemap
# ingest + frontier seeding, Gopher rules, KMV set operations, CDX
# recrawl diff, HITS, the discovery capstone, TAR ingest, the
# rank-function suite, adaptive recrawl scheduling, per-key caps, PSL
# registered domains, WARC revisit dedup write+read, per-domain caps,
# the CCNet tercile split, C4 cleaning); then the queries whose
# implementation changed late in the round (the WARC parser gained
# Location/payload-digest columns and the sitemap gate a textlist leg —
# every warc_records consumer re-verifies); then 11 of the r7-stale
# cohort and four module-coverage slots (the contract test requires
# every catalog module in the first 50). The remaining r7-stale rows
# rotate to the r13 head — new code outranks stale green history.
DRIVER_SAMPLE_HEAD: tuple[str, ...] = (
    # never driver-checked (round-12 additions, early then late)
    "pdf_text_extract_stats",
    "doc_extract_dispatch_stats",
    "qdigest_event_quantiles",
    "mixed_crawl_extract_stats",
    "http_encoding_stats",
    "crawl_link_pagerank",
    "quality_classifier_gate",
    "cdx_index_stats",
    "wat_export_stats",
    "redirect_resolution_stats",
    "sitemap_frontier_stats",
    "gopher_quality_stats",
    "kmv_set_overlap",
    "cdx_recrawl_diff",
    "host_graph_hits",
    "crawl_discovery_pipeline",
    "tar_archive_stats",
    "user_event_rank_suite",
    "recrawl_schedule_stats",
    "host_capped_sample_stats",
    "registered_domain_stats",
    "warc_revisit_roundtrip",
    "warc_revisit_resolve_stats",
    "domain_capped_corpus_stats",
    "ccnet_bucket_split",
    "c4_clean_stats",
    # implementation changed this round (warc_records schema growth,
    # robots extension fields, sitemap textlist leg)
    "robots_crawl_filter",
    "warc_crawl_stats",
    "warc_domain_stats",
    "wet_export_roundtrip",
    "crawl_to_wet_pipeline",
    "crawl_health_stats",
    "crawl_text_pipeline",
    "crawl_quality_mix",
    "url_canonical_dedup",
    # r7-stale cohort (oldest last-green rows; remainder rotates to r13)
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

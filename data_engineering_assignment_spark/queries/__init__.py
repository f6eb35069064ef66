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
# Round-11 head (catalog = 208): the twelve never-checked round-11 crawl
# additions first (html/URL/WET/quality/robots gates + the end-to-end
# composition); then the nine queries whose implementation
# changed this round (the WARC parser gained the negative-Content-Length
# guard, zip_members reads CRCs by ZipInfo, decode_wav honors
# wSamplesPerBlock for BOTH ADPCM codecs, and the phash int32-luma +
# batched-DCT rewrite touches every image/video fingerprint path plus
# incremental_image_dedup's new undecodable-row contract); then the four
# stalest queries (last green r6 — the recall-telemetry and CC-twin
# diagnostics that yielded their r10 slots); then 34 of the 46-strong r7
# cohort in registration order, swapping events_anomaly_zscore_bucketed
# in for the tail slot (it carries this round's only elevated perf probe
# and deserves a fresh correctness row) and trading four relational
# slots for module coverage (click_purchase_attribution /
# event_props_json / cms_token_counts — r7 — plus ml_peak_classification,
# r8, the oldest catalog_ml gate). The remaining r7 queries (plus
# customers_without_orders, bumped for the robots gate) rotate in next
# round ahead of the r8 cohort.
DRIVER_SAMPLE_HEAD: tuple[str, ...] = (
    "html_text_extract_stats",
    "warc_domain_stats",
    "crawl_text_pipeline",
    "url_canonical_dedup",
    "wet_export_roundtrip",
    "crawl_quality_mix",
    "robots_crawl_filter",
    "crawl_to_wet_pipeline",
    "html_main_content_stats",
    "html_charset_stats",
    "doc_bigram_lm_quality",
    "crawl_health_stats",
    "warc_crawl_stats",
    "zip_archive_stats",
    "wav_audio_stats",
    "adpcm_audio_stats",
    "ms_adpcm_audio_stats",
    "image_phash_pairs",
    "audio_phash_pairs",
    "video_phash_dups",
    "incremental_image_dedup",
    "ivf_recall_telemetry",
    "dedup_clusters_lsh",
    "lsh_recall_telemetry",
    "dedup_clusters_jaccard",
    "sales_per_year",
    "top_priority_null_count",
    "supplier_return_ratio",
    "brand_revenue",
    "top5_orders",
    "null_handling_metrics",
    "metrics_union",
    "click_purchase_attribution",
    "event_props_json",
    "cms_token_counts",
    "ml_peak_classification",
    "disjunctive_brand_revenue",
    "embedding_stats",
    "label_centroids",
    "cosine_topk_pq",
    "dedup_semantic",
    "dedup_semantic_survivors",
    "semantic_recall_telemetry",
    "dedup_semantic_kmeans",
    "incremental_semantic_dedup",
    "simhash_hamming_pairs",
    "dedup_jaccard_prefix",
    "decontaminate_ngram",
    "bloom_decontaminate",
    "events_anomaly_zscore_bucketed",
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

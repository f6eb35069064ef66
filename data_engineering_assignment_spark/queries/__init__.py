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
# Round-10 head (catalog = 192): entering the round every query had been
# driver-checked at least once (r1-r9 union) with zero standing failures.
# Order: the seven never-checked round-10 additions (image_phash_pairs,
# audio_phash_pairs, video_phash_dups, incremental_image_dedup,
# warc_crawl_stats, ms_adpcm_audio_stats, zip_archive_stats —
# ivf/lsh_recall_telemetry and the two rows-only CC twins
# dedup_clusters_jaccard/lsh, r6 diagnostics, yielded their slots);
# four queries whose implementation changed this round (jpeg_decode_stats
# grew the 16-bit-DQT leg, part_distance_sssp was rewritten to the delta
# frontier, dedup_clusters_star's cc_star gained the convergence guard,
# dedup_ngram_jaccard's shingle checkpoint went lazy); the four oldest
# queries (last green r5); the whole r6 cohort (38); then the oldest r7
# queries, with the last slot going to ml_eval_metrics (r7) so the head
# spans catalog_ml (module-coverage contract); above_nation_avg_customers
# and approx_distinct_users_rollup (r7) yielded their slots to the
# round-10 media gates.
DRIVER_SAMPLE_HEAD: tuple[str, ...] = (
    "image_phash_pairs",
    "audio_phash_pairs",
    "video_phash_dups",
    "incremental_image_dedup",
    "warc_crawl_stats",
    "ms_adpcm_audio_stats",
    "zip_archive_stats",
    "jpeg_decode_stats",
    "part_distance_sssp",
    "dedup_clusters_star",
    "dedup_ngram_jaccard",
    "event_interarrival_stats",
    "lang_source_chisq",
    "nation_revenue_share",
    "referential_integrity_audit",
    "bm25_topk",
    "corpus_boilerplate_3gram",
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "customer_year_setops",
    "dedup_exact",
    "dedup_lsh_portable",
    "dedup_minhash_lsh",
    "dedup_survivors",
    "doc_dup_span_stats",
    "doc_normalized_fingerprint",
    "doc_path_format",
    "doc_rolling_hash",
    "doc_simhash_portable",
    "doc_token_stats",
    "docs_stratified_sample",
    "event_props_variant",
    "event_value_trend",
    "events_gapfill_5m",
    "events_pivot_by_type",
    "events_trailing_hour_sum",
    "events_tumbling_10m",
    "jsonl_media_groups",
    "league_table",
    "nation_name_fuzzy",
    "order_ship_lag_30d",
    "orders_cube",
    "pii_redaction",
    "quality_by_source",
    "supplier_stats_salted",
    "user_purchase_totals",
    "value_quantiles_by_type",
    "weighted_median_price",
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

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
# in registration order.  Rounds 1-2 filled that sample with the relational /
# arrays / text families, so the analytics / llm / corpus / sources / intervals
# / ml families (52 queries) were never driver-verified despite passing the
# full local rehearsal.  This explicit head ordering puts exactly those
# previously-unsampled queries first (all oracle-gated except
# ``ml_peak_classification``, which is the rows-only representative for the ML
# family) so every catalog module lands in the driver's CORRECTNESS sample.
# Queries verified in earlier rounds follow in their original order.
DRIVER_SAMPLE_HEAD: tuple[str, ...] = (
    # catalog_analytics (20)
    "events_pivot_by_type",
    "orders_cube",
    "order_price_distribution",
    "customer_year_setops",
    "event_value_trend",
    "user_state_scd2",
    "daily_conversion_funnel",
    "orders_cdc_apply",
    "nation_name_fuzzy",
    "events_trailing_hour_sum",
    "user_event_type_sets",
    "nation_presence_full_outer",
    "events_anomaly_zscore",
    "order_price_histogram",
    "median_price_by_priority",
    "event_interarrival_stats",
    "nation_revenue_share",
    "referential_integrity_audit",
    "lang_source_chisq",
    "weighted_median_price",
    # catalog_llm (9)
    "docs_hash_sample",
    "data_mix_by_source",
    "decontaminate_ngram",
    "pii_redaction",
    "seq_packing",
    "training_corpus_build",
    "repetition_stats",
    "docs_stratified_sample",
    "quality_percentile_gate",
    # catalog_corpus (4)
    "doc_tfidf_top_terms",
    "doc_chunks",
    "corpus_boilerplate_3gram",
    "orders_profile",
    # catalog_sources (3)
    "jsonl_media_groups",
    "binary_media_inventory",
    "csv_sales_publisher_year",
    # catalog_intervals (3)
    "order_ship_lag_30d",
    "purchase_asof_last_click",
    "click_purchase_attribution",
    # catalog_ml (1; ml_energy_report trains 8 forests — kept out of the gate)
    "ml_peak_classification",
    # catalog_events tail never sampled in r1/r2 (3 of 11; rest rotate in later)
    "events_sessionize",
    "event_transitions",
    "user_retention_cohorts",
    # anchors from the modules already driver-verified in r2, so THIS round's
    # sample still spans every module (relational / arrays / text)
    "pricing_summary",
    "nation_rank_top2",
    "doc_path_format",
    "embedding_near_dup",
    "cosine_topk_lsh",
    "dedup_lsh_portable",
    "top_tokens_per_lang",
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

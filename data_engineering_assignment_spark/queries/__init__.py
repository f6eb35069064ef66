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
# Round-9 head (catalog = 189): entering the round the driver had checked
# 172/176 at least once; the only never-checked queries are the four
# end-of-r8 additions (kmv_distinct_users, hll_distinct_portable,
# user_value_ewma, winsorized_value_stats — each oracle-rehearsed locally
# at sf0.001 AND sf0.01, per the r8 verdict's top item they lead the
# head), plus the thirteen round-9 queries (png_profile_stats,
# dedup_clusters_star, gif_decode_stats, user_value_theilsen,
# bmp_decode_stats, tiff_decode_stats, adpcm_audio_stats,
# part_distance_sssp, jpeg_exif_stats, avi_video_stats,
# media_resize_stats, video_frame_sample_stats, ico_decode_stats —
# never checked) and png_decode_stats (implementation changed this
# round: the PNG codec was rewritten for the full legal profile).
# After them, strict age order: 31 of the 35 queries whose last green
# row is r5 (the displaced four — event_interarrival_stats,
# nation_revenue_share, referential_integrity_audit, lang_source_chisq —
# front the r10 head with the 40 r6-checked queries) — and the final
# slot goes to ml_energy_report (r6) so the head spans catalog_ml
# (module-coverage contract).
DRIVER_SAMPLE_HEAD: tuple[str, ...] = (
    # never driver-checked (end-of-r8 additions + the new full-profile
    # PNG gate)
    "kmv_distinct_users",
    "hll_distinct_portable",
    "user_value_ewma",
    "winsorized_value_stats",
    "png_profile_stats",
    "dedup_clusters_star",
    "gif_decode_stats",
    "user_value_theilsen",
    "bmp_decode_stats",
    "tiff_decode_stats",
    "adpcm_audio_stats",
    "part_distance_sssp",
    "jpeg_exif_stats",
    "avi_video_stats",
    "media_resize_stats",
    "video_frame_sample_stats",
    "ico_decode_stats",
    # implementation changed this round (decode_png/encode_png rewritten
    # for the full legal profile: Adam7, 16-bit, sub-byte, tRNS forms)
    "png_decode_stats",
    # last checked r5 (31 of 35; event_interarrival_stats,
    # nation_revenue_share, referential_integrity_audit and
    # lang_source_chisq displaced to the r10 head by the round-9 additions)
    "pricing_summary",
    "nation_rank_top2",
    "distinct_status_priority",
    "embedding_near_dup",
    "embedding_quantize_stats",
    "dedup_ngram_jaccard",
    "doc_simhash",
    "doc_regex_tokens",
    "top_tokens_per_lang",
    "docs_hash_sample",
    "data_mix_by_source",
    "seq_packing",
    "training_corpus_build",
    "repetition_stats",
    "events_hourly",
    "event_transitions",
    "user_retention_cohorts",
    "purchase_asof_last_click",
    "plusminus_top_by_role",
    "wav_audio_stats",
    "doc_tfidf_top_terms",
    "orders_profile",
    "vocab_top64",
    "vocab_encode_stats",
    "user_state_scd2",
    "orders_cdc_apply",
    "user_event_type_sets",
    "nation_presence_full_outer",
    "events_anomaly_zscore",
    "order_price_histogram",
    "median_price_by_priority",
    # last checked r6; keeps catalog_ml in the head (module-coverage contract)
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

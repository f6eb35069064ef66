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
# Round-16 head (catalog = 258, optimization round): everything whose
# implementation changed THIS round first — the r16 optimization touched
# the shingle-pair operators (small-file guard in ngram_jaccard_pairs /
# containment_pairs), resolve_redirects (single-pass per-url aggregation
# + checkpointed edge table), the two link-pagerank capstones (edge-list
# checkpoint), user_value_theilsen (post-agg parallelism guard + Generate
# boundary), cms_token_counts (sketch built from aggregated counts), and
# the ANN family (in-row argmax_cell assignment, merged _pq_prep
# checkpoint, let-bound codebook literal, probed-cell-pruned IVF-PQ
# encode; dedup_semantic_hier rides its oracle-gated twins here per the
# rows-only pairing rule);
# then the OWED r15 cohort — the _doc_ids fan-out gates whose plans
# changed in r15 but sat outside the r15 head (verdict finding #4:
# png/jpeg/tiff decode, video frame sample, the three phash pairs,
# incremental image dedup, MS-ADPCM, TAR, CDX recrawl, the four WARC
# round-trip/pairing gates, robots filter, MP3, the two bigram-LM
# consumers);
# then the oldest 10 of the r9-stale cohort alphabetically, plus the
# stalest catalog_intervals row (order_ship_lag_30d, r10) and the
# stalest catalog_ml row (ml_eval_metrics, r13) holding the
# module-coverage contract (every module in the first 50). The
# remaining r9-stale queries (orders_profile, png_decode_stats,
# pricing_summary ... winsorized_value_stats) rotate to the r17 head —
# all verified locally in this round's FULL sf0.01 oracle run
# (258/258).
DRIVER_SAMPLE_HEAD: tuple[str, ...] = (
    # implementation changed this round (r16 optimizations)
    "user_value_theilsen",
    "cms_token_counts",
    "redirect_resolution_stats",
    "crawl_link_pagerank",
    "pdf_link_pagerank",
    "dedup_clusters_star",
    "dedup_clusters_jaccard",
    "dedup_ngram_jaccard",
    "dedup_containment_pairs",
    "cosine_topk_ivf",
    "cosine_topk_pq",
    "cosine_topk_ivfpq",
    "ivf_recall_telemetry",
    "dedup_semantic",
    "dedup_semantic_survivors",
    "semantic_recall_telemetry",
    "incremental_semantic_dedup",
    "dedup_semantic_hier",
    # owed r15 cohort (plan changed by the _doc_ids fan-out, unchecked)
    "png_profile_stats",
    "jpeg_decode_stats",
    "tiff_decode_stats",
    "video_frame_sample_stats",
    "image_phash_pairs",
    "audio_phash_pairs",
    "video_phash_dups",
    "incremental_image_dedup",
    "ms_adpcm_audio_stats",
    "tar_archive_stats",
    "cdx_recrawl_diff",
    "warc_crawl_stats",
    "warc_revisit_roundtrip",
    "warc_revisit_resolve_stats",
    "warc_segment_reassembly",
    "warc_request_pairing_stats",
    "robots_crawl_filter",
    "mp3_audio_stats",
    "doc_bigram_lm_quality",
    "ccnet_bucket_split",
    # r9-stale cohort (oldest 10, alphabetical)
    "hll_distinct_portable",
    "ico_decode_stats",
    "jpeg_exif_stats",
    "kmv_distinct_users",
    "median_price_by_priority",
    "nation_presence_full_outer",
    "nation_rank_top2",
    "order_price_histogram",
    "orders_cdc_apply",
    # module-coverage slots (catalog_intervals r10, catalog_ml r13,
    # catalog_llm — sources held 24/50, llm had none)
    "order_ship_lag_30d",
    "ml_eval_metrics",
    "gopher_quality_stats",
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

"""Typed sources and sinks (SURVEY.md §2.1 S1-S8).

The reference's scans, generalized: explicit-schema CSV (S1), parquet
(S2-S4), binary files standing in for the Databricks-only ``image`` format
(S5 — decode happens in ``functions.colors`` / ``functions.multimodal``
UDFs), schema-inferred JSON Lines (S6), and local rows (S7). The engine adds
a parquet sink (S8 — the reference only ever ``show()``s).

Scale notes: explicit schemas avoid inference scans; binaryFile reads
parallelize per file and push ``pathGlobFilter`` down to the listing; the
parquet sink partitions by caller-chosen columns so downstream scans prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = ",",
    header: bool = True,
    date_format: str | None = None,
) -> DataFrame:
    """S1: explicit-schema CSV scan (Assignment-python.py:52)."""
    reader = spark.read.schema(schema)
    if date_format:
        reader = reader.option("dateFormat", date_format)
    return reader.csv(path, header=header, sep=sep)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S2-S4: self-describing parquet scan (:134,907)."""
    return spark.read.parquet(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """S6: JSON Lines scan; schema optional (inference costs an extra pass,
    :711 — pass one in production).

    ``corrupt_col`` opts into quarantine-style ingestion: malformed lines
    land intact in that column (PERMISSIVE mode) instead of silently
    nulling out or failing the job — filter on it to split clean rows from
    a dead-letter stream. Requires an explicit ``schema`` (the column must
    be declared; with inference Spark would widen every field to string)."""
    reader = spark.read
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        from pyspark.sql.types import StringType, StructField

        schema = StructType(
            [*schema.fields, StructField(corrupt_col, StringType(), True)]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """S5 (portable image source): one row per file with (path,
    modificationTime, length, content). Decode via functions/ UDFs."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_images(
    spark: SparkSession, path: str, drop_invalid: bool = True
) -> DataFrame:
    """S5, reference-exact surface (Assignment-python.py:710): Spark's native
    ``image`` source — one row per file with the ``image`` struct (origin,
    height, width, nChannels, mode, data), decoded JVM-side by Java ImageIO
    in OpenCV BGR(A) byte order. Parallelizes per file like binaryFile.

    The binaryFile + own-codec path (:func:`read_binary_files` +
    functions/multimodal.decode_png) remains the production route — it
    handles formats ImageIO lacks, keeps bytes for non-image analytics, and
    its decode is cross-checked against THIS source in
    tests/test_sources.py — but the native format is available for
    reference-parity workloads."""
    return (
        spark.read.format("image")
        .option("dropInvalid", str(drop_invalid).lower())
        .load(path)
    )


def local_rows(spark: SparkSession, rows: list, schema) -> DataFrame:
    """S7: driver-local rows (:1010-1011)."""
    return spark.createDataFrame(rows, schema)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Clustered layout sink: range-partition on ``sort_cols`` then sort
    within each partition before writing. Every output file then covers a
    disjoint key range, so parquet min/max statistics prune whole files /
    row groups on key predicates — the single-key-prefix version of
    clustering a 100 TB table for scan locality. (Partition-value
    directories — ``write_parquet(partition_by=...)`` — prune on LOW-
    cardinality columns; range-clustering handles the high-cardinality
    keys a directory per value would shatter.)"""
    part = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    part.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """S8+: parquet sink with optional partition columns."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) key: interleaves the low ``bits`` bits of each
    integer column so files clustered by the single key stay local in EVERY
    dimension — the multi-column clustering technique behind lakehouse
    OPTIMIZE ZORDER BY. Pure JVM bit arithmetic (shift/or per bit), no UDF.

    Callers pre-scale columns into [0, 2^bits) rank/bucket space; values are
    clamped here so outliers cannot corrupt the interleave."""
    from pyspark.sql import functions as F

    ndims = len(cols)
    z = F.lit(0).cast("long")
    top = (1 << bits) - 1
    clamped = [
        F.least(F.greatest(F.col(c) if isinstance(c, str) else c,
                           F.lit(0)).cast("long"), F.lit(top))
        for c in cols
    ]
    for i in range(bits):
        for d, c in enumerate(clamped):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ndims + d))
    return z


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered sink: range-partition + sort on the Morton key of
    ``cols``, so every output file covers a small hyper-rectangle — parquet
    min/max stats then prune files on predicates over ANY of the clustered
    columns, where single-key range clustering (``write_sorted_parquet``)
    only prunes on its leading column."""
    z = zorder_key(cols, bits).alias("_zkey")
    with_z = df.withColumn("_zkey", z)
    part = (
        with_z.repartitionByRange(n_files, "_zkey")
        if n_files
        else with_z.repartitionByRange("_zkey")
    )
    part.sortWithinPartitions("_zkey").drop("_zkey").write.mode(mode).parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the columnar format family's second member, JVM-native
    (predicate pushdown + column pruning like parquet; Spark's OrcFileFormat
    keeps the same FileScan machinery, so every plan invariant in
    tests/test_plans.py applies unchanged)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """ORC sink with optional partition columns — parquet-sink parity for
    pipelines whose downstream readers are ORC-native (Hive/Trino estates).
    No DuckDB reader exists for ORC in this sandbox, so the round-trip is
    test-gated (byte-identical dataframe content vs the parquet sink)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def warc_records(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "archive_id",
    include_body: bool = False,
    include_payload: bool = False,
) -> DataFrame:
    """Explode WARC crawl-archive binary columns into one row per record
    (functions/warc.py: plain or per-record-gzip .warc.gz) — the ingest
    shape of LLM training-data pipelines (Common Crawl ships WARC).
    Arrow-batched mapInPandas; archive bytes never leave the executor.
    Unparseable archives survive as one parse_ok = false row (dead-letter
    discipline), so corrupt crawl files are countable, never dropped.

    ``rec_offset``/``rec_length`` are the byte span a range request
    needs to fetch exactly this record from the archive (the CDX index
    contract: the record's own span in a plain WARC, the compressed
    gzip MEMBER's span in a .warc.gz — Common Crawl's convention).

    ``http_content_type`` is the HTTP response's OWN Content-Type header
    (first occurrence, RFC 9110 singleton; NULL for non-HTTP records or
    headerless responses) — distinct from ``content_type``, the WARC
    record's envelope type — and is what
    ``operators.crawl.document_extract`` dispatches on.
    ``http_location`` is the response's Location header verbatim
    (possibly a RELATIVE reference; NULL when absent) — with
    ``http_status`` it is the redirect-edge input to
    ``operators.crawl.resolve_redirects``.
    ``payload_digest`` is the md5 hex of the record's RAW payload bytes
    (the WARC-Payload-Digest role, md5 because both engines can replay
    it) — the content-change signal ``operators.crawl.cdx_snapshot_diff``
    keys recrawl deltas on; a metadata-sized column, so it rides along
    without ``include_body``. ``payload_digest_declared`` is the
    record's own WARC-Payload-Digest HEADER verbatim (NULL when absent)
    — on a revisit record it names the STORED copy's digest, the join
    key ``operators.crawl.resolve_revisits`` uses.

    ``record_id`` / ``concurrent_to`` are the WARC-Record-ID and
    WARC-Concurrent-To headers verbatim (ISO 28500 §5.4/§5.7: a
    'request' record names its 'response' twin's id in
    WARC-Concurrent-To) — the join keys
    ``operators.crawl.pair_requests`` uses to put request-side headers
    (``http_user_agent`` / ``http_referer``, parsed from
    msgtype=request HTTP heads) onto the response rows.

    ``segment_number`` / ``segment_origin_id`` / ``segment_total_length``
    are the ISO 28500 §5.18-5.20 record-segmentation headers (a record
    too large for one file writes segment 1 with its own Record-ID,
    then 'continuation' records naming it in WARC-Segment-Origin-ID,
    the last carrying WARC-Segment-Total-Length; junk numerics degrade
    to NULL) — the inputs to
    ``operators.crawl.reassemble_segments``. ``include_payload=True``
    adds ``payload``: the record's RAW payload bytes (what continuation
    records carry — they are not HTTP messages, so ``http_body`` never
    has them); opt-in for the same reason as ``include_body``.

    ``include_body=True`` adds ``http_body`` (the HTTP message body of
    ``application/http`` response records, NULL elsewhere — the input
    to ``operators.crawl.html_extract`` / ``document_extract``) and
    ``http_body_ok``: the body is DECODED per the response's own
    framing headers (chunked transfer undone, gzip/deflate
    content-encoding decompressed — functions.warc.decode_http_body);
    ``http_body_ok = false`` means an unsupported coding (br/zstd) or a
    decode failure and the column carries the RAW bytes, a countable
    dead-letter. Opt-in because metadata-only scans shouldn't ship page
    bytes through the rest of the plan."""
    import hashlib
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.warc import parse_warc

    def _int_or_none(v):
        # junk numeric headers degrade to NULL, never crash the record
        try:
            return int(v) if v is not None else None
        except ValueError:
            return None

    schema = (
        f"{id_col} long, rec_idx int, warc_type string, target_uri string,"
        " content_type string, http_status int, http_content_type string,"
        " http_location string,"
        " record_id string, concurrent_to string,"
        " http_user_agent string, http_referer string,"
        " segment_number int, segment_origin_id string,"
        " segment_total_length long,"
        " payload_len long, payload_digest string,"
        " payload_digest_declared string,"
        " rec_offset long, rec_length long,"
        " parse_ok boolean"
    )
    if include_body:
        schema += ", http_body binary, http_body_ok boolean"
    if include_payload:
        schema += ", payload binary"

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            id_col, "rec_idx", "warc_type", "target_uri", "content_type",
            "http_status", "http_content_type", "http_location",
            "record_id", "concurrent_to",
            "http_user_agent", "http_referer",
            "segment_number", "segment_origin_id", "segment_total_length",
            "payload_len", "payload_digest", "payload_digest_declared",
            "rec_offset", "rec_length", "parse_ok",
        ]
        if include_body:
            cols += ["http_body", "http_body_ok"]
        if include_payload:
            cols += ["payload"]
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                aid = int(aid)
                try:
                    recs = parse_warc(bytes(content))
                    for i, r in enumerate(recs):
                        h = r["headers"]
                        row = (
                            aid,
                            i,
                            h.get("WARC-Type"),
                            h.get("WARC-Target-URI"),
                            h.get("Content-Type"),
                            r.get("http_status"),
                            r.get("http_content_type"),
                            r.get("http_location"),
                            h.get("WARC-Record-ID"),
                            h.get("WARC-Concurrent-To"),
                            r.get("http_user_agent"),
                            r.get("http_referer"),
                            _int_or_none(h.get("WARC-Segment-Number")),
                            h.get("WARC-Segment-Origin-ID"),
                            _int_or_none(h.get("WARC-Segment-Total-Length")),
                            len(r["payload"]),
                            hashlib.md5(r["payload"]).hexdigest(),
                            h.get("WARC-Payload-Digest"),
                            r["rec_offset"],
                            r["rec_length"],
                            True,
                        )
                        if include_body:
                            row += (
                                r.get("http_body"),
                                r.get("http_body_ok"),
                            )
                        if include_payload:
                            row += (r["payload"],)
                        rows.append(row)
                except Exception:
                    row = (aid,) + (None,) * 19 + (False,)
                    if include_body:
                        row += (None, None)
                    if include_payload:
                        row += (None,)
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(mapper, schema)


def tar_members(
    df: DataFrame, content_col: str = "content", id_col: str = "archive_id"
) -> DataFrame:
    """Explode TAR archive binary columns into one row per member — the
    other container crawl dumps and dataset drops ship in beside ZIPs
    and WARCs (plain tar and tar.gz/bz2/xz, compression sniffed by
    stdlib ``tarfile`` ``r:*``). Regular files are READ and carry an
    md5 ``content_digest`` (the payload_digest discipline — both
    engines can replay md5, and reading verifies the member actually
    decodes); symlinks/hardlinks surface as kind rows with NULL digest;
    directory entries are skipped like zip_members. Unreadable archives
    survive as one parse_ok = false row (countable dead-letter)."""
    import hashlib
    import io
    import tarfile
    from collections.abc import Iterator

    import pandas as pd

    schema = (
        f"{id_col} long, member string, size long, kind string,"
        " mtime long, content_digest string, parse_ok boolean"
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            id_col, "member", "size", "kind", "mtime", "content_digest",
            "parse_ok",
        ]
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                aid = int(aid)
                try:
                    with tarfile.open(
                        fileobj=io.BytesIO(bytes(content)), mode="r:*"
                    ) as tf:
                        for info in tf:
                            if info.isdir():
                                continue
                            if info.isreg():
                                kind = "file"
                                fh = tf.extractfile(info)
                                digest = hashlib.md5(fh.read()).hexdigest()
                            else:
                                kind = (
                                    "sym"
                                    if info.issym()
                                    else "hard"
                                    if info.islnk()
                                    else "special"
                                )
                                digest = None
                            rows.append(
                                (
                                    aid,
                                    info.name,
                                    int(info.size),
                                    kind,
                                    int(info.mtime),
                                    digest,
                                    True,
                                )
                            )
                except Exception:
                    rows.append((aid, None, None, None, None, None, False))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(mapper, schema)


def _binary_meta_source(
    df: DataFrame,
    content_col: str,
    id_col: str,
    parse,
    schema_tail: str,
    rows_fn,
) -> DataFrame:
    """Shared skeleton for the binary container-metadata sources
    (mp3_meta / webp_meta / bmff_image_meta / mp4_tracks / svg_meta /
    flac_meta / ogg_meta): Arrow-batched mapInPandas, zero shuffle,
    one ``parse(bytes)`` per file, ``rows_fn(parsed)`` yielding the
    value tuples (one per output row, WITHOUT id/parse_ok — most
    sources emit exactly one; explode sources like mp4_tracks emit
    one per track). Any exception — truncation ValueErrors from the
    bounded walks, junk bytes, guarded-profile NotImplementedErrors —
    survives as ONE all-None ``parse_ok = false`` row: the countable
    dead-letter contract every codec gate aggregates on.

    ``schema_tail`` is the scalar column list between the id and
    parse_ok (``"width int, height int"``); the dead-letter row width
    and the pandas column names are derived from it, so a source can
    never hand-count its Nones wrong (the r14 deferred review
    finding)."""
    from collections.abc import Iterator

    import pandas as pd

    schema = f"{id_col} long, {schema_tail}, parse_ok boolean"
    # split on TOP-LEVEL commas only — decimal(p,s) / struct<...> /
    # map<...> field types legally contain commas (review finding:
    # a naive split would mis-derive the dead-letter width and fail
    # only at executor runtime)
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(schema):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(schema[start:i])
            start = i + 1
    fields.append(schema[start:])
    names = [f.strip().split()[0] for f in fields]
    n_vals = len(names) - 2  # between id and parse_ok

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                aid = int(aid)
                try:
                    for vals in rows_fn(parse(bytes(content))):
                        rows.append((aid, *vals, True))
                except Exception:
                    rows.append((aid,) + (None,) * n_vals + (False,))
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(mapper, schema)


def mp3_meta(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """MP3 metadata, one row per file (``functions.mp3.parse_mp3``:
    ID3v2.3/2.4 + trailing ID3v1 tag walks, MPEG-1 Layer III frame
    census with exact integer duration; audio decode stays guarded).
    Output: id3_version, title, artist, album, n_frames, sample_rate,
    bitrate_kbps, cbr, duration_ms, parse_ok; junk and guarded
    profiles survive as one parse_ok = false row."""
    from ..functions.mp3 import parse_mp3

    keys = ("id3_version", "title", "artist", "album", "n_frames",
            "sample_rate", "bitrate_kbps", "cbr", "duration_ms")
    return _binary_meta_source(
        df, content_col, id_col, parse_mp3,
        "id3_version string, title string, artist string,"
        " album string, n_frames long, sample_rate int,"
        " bitrate_kbps int, cbr boolean, duration_ms long",
        lambda r: [tuple(r[k] for k in keys)],
    )


def webp_meta(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """WebP container metadata, one row per file
    (``functions.webp.parse_webp``: RIFF walk, VP8/VP8L bitstream
    headers, the VP8X extended profile with ANIM/ANMF animation frames
    and exact integer duration sums; pixel decode stays guarded).
    Output: format, width, height, has_alpha, is_animated, n_frames,
    duration_ms, has_exif, has_icc, parse_ok; junk survives as one
    parse_ok = false row."""
    from ..functions.webp import parse_webp

    keys = ("format", "width", "height", "has_alpha", "is_animated",
            "n_frames", "duration_ms", "has_exif", "has_icc")
    return _binary_meta_source(
        df, content_col, id_col, parse_webp,
        "format string, width int, height int, has_alpha boolean,"
        " is_animated boolean, n_frames int, duration_ms long,"
        " has_exif boolean, has_icc boolean",
        lambda r: [tuple(r[k] for k in keys)],
    )


def bmff_image_meta(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """AVIF/HEIC image-container metadata, one row per file
    (``functions.mp4.parse_bmff_image``: ISO/IEC 23008-12 item
    structure — pitm -> ipma -> ispe so auxiliary/thumbnail items
    can't shadow the primary image's dims; AV1/HEVC item decode stays
    guarded). Output: major_brand, primary_item, n_items, codec,
    width, height, has_exif, parse_ok; junk survives as one
    parse_ok = false row."""
    from ..functions.mp4 import parse_bmff_image

    keys = ("major_brand", "primary_item", "n_items", "codec",
            "width", "height", "has_exif")
    return _binary_meta_source(
        df, content_col, id_col, parse_bmff_image,
        "major_brand string, primary_item long, n_items int,"
        " codec string, width long, height long, has_exif boolean",
        lambda r: [tuple(r[k] for k in keys)],
    )


def mp4_tracks(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """Explode MP4/ISO-BMFF binary columns into one row per TRACK —
    container metadata for the dominant web video format, without any
    sample decode (``functions.mp4.parse_mp4``: box walk, mvhd/tkhd/
    mdhd v0+v1, hdlr classification, stsd codec fourcc, stts sample
    counts; H.264/AAC bitstream decode stays guarded per the codec-gate
    discipline). Output per track: major_brand, movie_duration_ms,
    n_tracks, n_fragments (top-level moof count — the fMP4/CMAF
    streaming profile), track_id, kind ('video'/'audio'/raw fourcc),
    codec, width, height, n_samples (moov sample tables),
    duration_ms (exact integer floor divisions of the timescale
    pairs), fragment_samples (trun sample-count sum for this track
    across all fragments) — plus parse_ok. Unparseable bytes survive
    as ONE parse_ok = false row (the countable dead-letter contract).
    A parseable file with no tracks keeps its movie-level fields on a
    single track-less parse_ok = true row."""
    from ..functions.mp4 import parse_mp4

    def rows_fn(r):
        movie = (r["major_brand"], r["movie_duration_ms"], r["n_tracks"],
                 r["n_fragments"])
        if not r["tracks"]:
            return [(*movie[:2], 0, movie[3],
                     None, None, None, None, None, None, None, None)]
        return [
            (*movie, t["track_id"], t["kind"], t["codec"], t["width"],
             t["height"], t["n_samples"], t["duration_ms"],
             t["fragment_samples"])
            for t in r["tracks"]
        ]

    return _binary_meta_source(
        df, content_col, id_col, parse_mp4,
        "major_brand string, movie_duration_ms long, n_tracks int,"
        " n_fragments int, track_id long, kind string, codec string,"
        " width int, height int, n_samples long, duration_ms long,"
        " fragment_samples long",
        rows_fn,
    )


def svg_meta(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """SVG metadata, one row per file (``functions.svg.parse_svg``:
    intrinsic pixel size with the attribute→viewBox fallback ladder,
    declared units, viewBox extent, element count, script presence,
    title; rendering stays out of scope). Output: width, height,
    width_unit, height_unit, vb_width, vb_height, n_elements,
    has_script, title, parse_ok; junk, non-svg XML and malformed
    lengths survive as one parse_ok = false row."""
    from ..functions.svg import parse_svg

    keys = ("width", "height", "width_unit", "height_unit",
            "vb_width", "vb_height", "n_elements", "has_script", "title")
    return _binary_meta_source(
        df, content_col, id_col, parse_svg,
        "width double, height double, width_unit string,"
        " height_unit string, vb_width double, vb_height double,"
        " n_elements int, has_script boolean, title string",
        lambda r: [tuple(r[k] for k in keys)],
    )


def flac_meta(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """FLAC metadata, one row per file (``functions.flac.parse_flac``:
    STREAMINFO packed fields with exact integer duration,
    VORBIS_COMMENT tags, PICTURE presence, block census; audio decode
    stays guarded). Output: sample_rate, channels, bits_per_sample,
    total_samples, duration_ms, title, artist, album, n_blocks,
    has_picture, parse_ok; junk survives as one parse_ok = false row."""
    from ..functions.flac import parse_flac

    keys = ("sample_rate", "channels", "bits_per_sample",
            "total_samples", "duration_ms", "title", "artist", "album",
            "n_blocks", "has_picture")
    return _binary_meta_source(
        df, content_col, id_col, parse_flac,
        "sample_rate int, channels int, bits_per_sample int,"
        " total_samples long, duration_ms long, title string,"
        " artist string, album string, n_blocks int,"
        " has_picture boolean",
        lambda r: [tuple(r[k] for k in keys)],
    )


def ogg_meta(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """Ogg container metadata, one row per file
    (``functions.ogg.parse_ogg``: page walk, BOS stream census,
    Vorbis/Opus/Theora identification headers, exact integer duration
    from the primary stream's last granule — Opus on the always-48kHz
    output timeline minus pre-skip; codec decode stays guarded).
    Output: n_pages, n_streams, codec, sample_rate, channels,
    duration_ms, pre_skip, parse_ok; junk survives as one
    parse_ok = false row."""
    from ..functions.ogg import parse_ogg

    keys = ("n_pages", "n_streams", "codec", "sample_rate", "channels",
            "duration_ms", "pre_skip")
    return _binary_meta_source(
        df, content_col, id_col, parse_ogg,
        "n_pages int, n_streams int, codec string, sample_rate int,"
        " channels int, duration_ms long, pre_skip int",
        lambda r: [tuple(r[k] for k in keys)],
    )


def subtitle_cues(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """Explode subtitle files (SRT / WebVTT, sniffed by the WEBVTT
    header — ``functions.subtitles.parse_subtitles``) into one row per
    CUE: kind, cue_id (SRT number / VTT identifier, as string),
    start_ms, end_ms (exact integer milliseconds), text, parse_ok.
    A cue-less but valid file keeps one (kind, NULL-cue) census row;
    junk/undecodable bytes survive as one parse_ok = false row."""
    from ..functions.subtitles import parse_subtitles

    def rows_fn(r):
        if not r["cues"]:
            return [(r["kind"], None, None, None, None)]
        return [
            (
                r["kind"],
                None if c["idx"] is None else str(c["idx"]),
                c["start_ms"],
                c["end_ms"],
                c["text"],
            )
            for c in r["cues"]
        ]

    return _binary_meta_source(
        df, content_col, id_col, parse_subtitles,
        "kind string, cue_id string, start_ms long, end_ms long,"
        " text string",
        rows_fn,
    )


def hls_meta(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """HLS playlist metadata, one row per file
    (``functions.hls.parse_m3u8``): master playlists report the
    variant census (count, max bandwidth, the max-bandwidth variant's
    resolution), media playlists the segment census (count, exact
    integer total duration, target duration, VOD-vs-live endlist).
    Output: kind, n_variants, max_bandwidth, best_width, best_height,
    n_segments, total_duration_ms, target_duration_s, endlist,
    version, parse_ok; junk survives as one parse_ok = false row."""
    from ..functions.hls import parse_m3u8

    def rows_fn(r):
        if r["kind"] == "master":
            best = max(r["variants"], key=lambda v: v["bandwidth"])
            return [(
                "master", r["n_variants"], best["bandwidth"],
                best["width"], best["height"],
                None, None, None, None, r["version"],
            )]
        return [(
            "media", None, None, None, None,
            r["n_segments"], r["total_duration_ms"],
            r["target_duration_s"], r["endlist"], r["version"],
        )]

    return _binary_meta_source(
        df, content_col, id_col, parse_m3u8,
        "kind string, n_variants int, max_bandwidth long,"
        " best_width int, best_height int, n_segments int,"
        " total_duration_ms long, target_duration_s int,"
        " endlist boolean, version int",
        rows_fn,
    )


def eml_messages(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """E-mail metadata + first-text-body extraction, one row per
    message (``functions.mime.parse_eml``: RFC 5322 headers with
    encoded-words decoded, MIME part walk, attachment census).
    Output: from_addr, subject, n_recipients, n_parts, max_depth,
    text (first text/plain leaf, charset-decoded), has_html,
    n_attachments, att_bytes (decoded attachment byte sum), parse_ok;
    junk survives as one parse_ok = false row."""
    from ..functions.mime import parse_eml

    def rows_fn(r):
        return [(
            r["from_addr"], r["subject"], len(r["to_addrs"]),
            r["n_parts"], r["max_depth"], r["text"], r["has_html"],
            r["n_attachments"],
            sum(
                p["size_decoded"] for p in r["parts"]
                if p["is_attachment"]
            ),
        )]

    return _binary_meta_source(
        df, content_col, id_col, parse_eml,
        "from_addr string, subject string, n_recipients int,"
        " n_parts int, max_depth int, text string, has_html boolean,"
        " n_attachments int, att_bytes long",
        rows_fn,
    )


def png_text_meta(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """PNG ancillary-chunk metadata, one row per file
    (``functions.pngmeta.parse_png_meta``: tEXt/zTXt/iTXt census,
    eXIf presence, tIME stamp, pHYs dpi; chunk CRCs verified).
    Output: width, height, bit_depth, color_type, n_texts,
    text_chars (decoded text length sum), has_exif, exif_bytes,
    time, dpi_x, dpi_y, parse_ok; junk and CRC-corrupt files survive
    as one parse_ok = false row."""
    from ..functions.pngmeta import parse_png_meta

    def rows_fn(r):
        return [(
            r["width"], r["height"], r["bit_depth"], r["color_type"],
            len(r["texts"]),
            sum(len(t) for _, t in r["texts"]),
            r["has_exif"], r["exif_bytes"], r["time"],
            r["dpi_x"], r["dpi_y"],
        )]

    return _binary_meta_source(
        df, content_col, id_col, parse_png_meta,
        "width long, height long, bit_depth int, color_type int,"
        " n_texts int, text_chars long, has_exif boolean,"
        " exif_bytes int, time string, dpi_x int, dpi_y int",
        rows_fn,
    )


def ics_events(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """Explode iCalendar files (``functions.ics.parse_ics``) into one
    row per VEVENT, calendar-level counts repeated on each row:
    n_events, n_todos, uid, summary (escapes decoded), duration_s
    (exact integer — DURATION property or a bare DATE-TIME
    DTSTART/DTEND pair; never timezone guessing), recurring,
    n_attendees, all_day, parse_ok. An event-less but valid calendar
    keeps one census row; junk survives as one parse_ok = false row."""
    from ..functions.ics import parse_ics

    def rows_fn(r):
        if not r["events"]:
            return [(r["n_events"], r["n_todos"], None, None, None,
                     None, None, None)]
        return [
            (
                r["n_events"], r["n_todos"], e["uid"], e["summary"],
                e["duration_s"], e["recurring"], e["n_attendees"],
                e["all_day"],
            )
            for e in r["events"]
        ]

    return _binary_meta_source(
        df, content_col, id_col, parse_ics,
        "n_events int, n_todos int, uid string, summary string,"
        " duration_s long, recurring boolean, n_attendees int,"
        " all_day boolean",
        rows_fn,
    )


def zip_members(df: DataFrame, content_col: str = "content", id_col: str = "archive_id") -> DataFrame:
    """Explode ZIP archive binary columns into one row per member —
    crawl dumps and dataset drops ship as ZIPs next to WARCs. Stdlib
    ``zipfile`` over an in-memory buffer (stored + deflate members),
    Arrow-batched mapInPandas; each member is READ so its CRC is
    actually verified (``crc_ok``), not just walked. Unreadable
    archives survive as one parse_ok = false row; a bad member flips
    only its own crc_ok (both dead-letter levels countable)."""
    import io
    import zipfile
    from collections.abc import Iterator

    import pandas as pd

    schema = (
        f"{id_col} long, member string, size_uncompressed long,"
        " size_compressed long, method string, crc_ok boolean,"
        " parse_ok boolean"
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            id_col, "member", "size_uncompressed", "size_compressed",
            "method", "crc_ok", "parse_ok",
        ]
        methods = {zipfile.ZIP_STORED: "stored", zipfile.ZIP_DEFLATED: "deflate"}
        for pdf in batches:
            rows = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                aid = int(aid)
                try:
                    with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                        infos = zf.infolist()
                        for info in infos:
                            if info.is_dir():
                                continue
                            try:
                                # Read by ZipInfo, not name: duplicate member
                                # names are legal in ZIP, and a name lookup
                                # resolves to the FIRST match — by-object read
                                # verifies THIS member's CRC.
                                zf.read(info)
                                crc_ok = True
                            except Exception:
                                crc_ok = False
                            rows.append(
                                (
                                    aid,
                                    info.filename,
                                    info.file_size,
                                    info.compress_size,
                                    methods.get(info.compress_type, str(info.compress_type)),
                                    crc_ok,
                                    True,
                                )
                            )
                except Exception:
                    rows.append((aid, None, None, None, None, None, False))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(mapper, schema)

"""Source robustness: corrupt-record quarantine on JSONL, parquet schema
evolution via mergeSchema."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from data_engineering_assignment_spark import sources


def test_jsonl_corrupt_records_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": 2, "name": "also ok"}\n'
        "{not json at all}\n"
        '{"id": "not-a-number", "name": "type clash"}\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    df = sources.read_jsonl(spark, str(p), schema, corrupt_col="_bad").cache()
    clean = df.filter("_bad IS NULL")
    bad = df.filter("_bad IS NOT NULL")
    assert sorted(r["id"] for r in clean.collect()) == [1, 2]
    # both malformed lines survive verbatim for the dead-letter path
    bad_lines = {r["_bad"] for r in bad.collect()}
    assert "{not json at all}" in bad_lines
    assert any("not-a-number" in line for line in bad_lines)
    assert len(bad_lines) == 2
    df.unpersist()


def test_jsonl_corrupt_col_requires_schema(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="schema"):
        sources.read_jsonl(spark, str(tmp_path), corrupt_col="_bad")


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Old files lack the new column; mergeSchema unions the schemas and
    back-fills nulls — the additive-evolution contract for long-lived
    datasets."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, s string").write.parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, s string, score double"
    ).write.mode("append").parquet(d)
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"id", "s", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}


def test_sorted_parquet_files_cover_disjoint_ranges(spark, sf_dir, tmp_path):
    """write_sorted_parquet must produce files whose key ranges do not
    overlap — the property that lets parquet min/max stats prune whole
    files on key predicates at scale."""
    import glob

    import pyarrow.parquet as pq

    from data_engineering_assignment_spark.tables import load

    out = str(tmp_path / "orders_sorted")
    sources.write_sorted_parquet(
        load(spark, sf_dir, "orders"), out, ["o_orderkey"], n_files=4
    )
    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.read_metadata(f)
        idx = md.schema.names.index("o_orderkey")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) >= 2
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo  # strictly disjoint, no interleaving
    # and the clustered copy is read-identical to the source
    n = spark.read.parquet(out).count()
    assert n == load(spark, sf_dir, "orders").count()


def test_profile_approx_variant_avoids_expand(spark, sf_dir):
    """Exact multi-column count_distinct plans an Expand (rows x columns);
    the approx variant must not — that is its reason to exist at scale."""
    from data_engineering_assignment_spark import plans
    from data_engineering_assignment_spark.operators.corpus import profile_table
    from data_engineering_assignment_spark.tables import load

    orders = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    assert "Expand" in plans.simple_plan(profile_table(orders, cols))
    approx = profile_table(orders, cols, exact=False)
    assert "Expand" not in plans.simple_plan(approx)
    got = {r["column_name"]: r for r in approx.collect()}
    exact = {r["column_name"]: r for r in profile_table(orders, cols).collect()}
    for c in cols:  # HLL estimates within a loose band of truth
        assert abs(got[c]["n_distinct"] - exact[c]["n_distinct"]) <= 0.1 * exact[c]["n_distinct"] + 5
        assert got[c]["n_nulls"] == exact[c]["n_nulls"]


def test_synthetic_docs_datasource(spark):
    """Spark 4 Python DataSource API: partition-parallel deterministic reads
    through the normal spark.read.format path."""
    from data_engineering_assignment_spark.sources.synthetic import (
        make_doc,
        register_synthetic_docs,
    )

    register_synthetic_docs(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 200)
        .option("partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 200
    assert sorted(r["doc_id"] for r in rows) == list(range(200))
    # executor rows match the shared row function exactly (determinism)
    by_id = {r["doc_id"]: tuple(r) for r in rows}
    for i in (0, 7, 199):
        assert by_id[i] == make_doc(i)
    # a second read is byte-identical
    again = (
        spark.read.format("synthetic_docs")
        .option("n", 200)
        .option("partitions", 4)
        .load()
        .collect()
    )
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_zorder_sink_clusters_all_dimensions(spark, tmp_path):
    """Z-order clustering: each output file covers a narrow range in BOTH
    clustered columns (single-key range clustering only bounds the leading
    one), so parquet min/max stats prune on either predicate."""
    import glob

    import pyarrow.parquet as pq

    from data_engineering_assignment_spark import sources

    n = 1 << 12
    grid = 1 << 6  # 64x64 grid, both coords in [0, 64)
    df = spark.range(n).selectExpr(
        "id % 64 AS x", "CAST(id / 64 AS long) AS y", "id AS payload"
    )
    out = str(tmp_path / "zorder")
    sources.write_zorder_parquet(df, out, ["x", "y"], bits=6, n_files=16)

    def spans(path):
        xs, ys = [], []
        for f in sorted(glob.glob(path + "/*.parquet")):
            md = pq.read_metadata(f)
            x_stats = [md.row_group(i).column(0).statistics for i in range(md.num_row_groups)]
            y_stats = [md.row_group(i).column(1).statistics for i in range(md.num_row_groups)]
            xs.append(max(s.max for s in x_stats) - min(s.min for s in x_stats))
            ys.append(max(s.max for s in y_stats) - min(s.min for s in y_stats))
        return xs, ys
    xs, ys = spans(out)
    assert len(xs) >= 8
    # every file's x-span AND y-span is a fraction of the 64-wide domain
    assert max(xs) <= 32 and max(ys) <= 32
    # correctness: round trip preserves the data
    assert spark.read.parquet(out).count() == n


def test_native_image_source_matches_own_codec(spark):
    """The native format('image') decode (Java ImageIO, OpenCV BGRA order)
    and our dependency-free PNG codec must agree BYTE-FOR-BYTE on every
    committed fixture — two independent decoders pinning each other."""
    import hashlib
    from pathlib import Path

    from pyspark.sql import functions as F

    from data_engineering_assignment_spark.functions.multimodal import decode_png
    from data_engineering_assignment_spark.sources import read_images

    d = Path(__file__).parent / "fixtures" / "media_png"
    native = {
        r["fname"]: r
        for r in read_images(spark, str(d))
        .select(
            F.element_at(F.split("image.origin", "/"), -1).alias("fname"),
            "image.width",
            "image.height",
            "image.nChannels",
            F.md5("image.data").alias("data_md5"),
        )
        .collect()
    }
    assert len(native) == 3
    for png in sorted(d.glob("*.png")):
        frames, meta = decode_png(png.read_bytes())
        n = native[png.name]
        assert (n["width"], n["height"], n["nChannels"]) == (
            meta["width"], meta["height"], meta["channels"],
        )
        assert n["data_md5"] == hashlib.md5(frames[0].tobytes()).hexdigest()


def test_orc_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    """ORC sink + scan must reproduce the exact rows the parquet sink
    writes, including partitioned layout pruning."""
    from pyspark.sql import functions as F

    from data_engineering_assignment_spark.sources import (
        read_orc,
        write_orc,
        write_parquet,
    )
    from data_engineering_assignment_spark.tables import load

    orders = load(spark, sf_dir, "orders").limit(500)
    po, pp = str(tmp_path / "o.orc"), str(tmp_path / "o.parquet")
    write_orc(orders, po, partition_by=["o_orderpriority"])
    write_parquet(orders, pp, partition_by=["o_orderpriority"])

    a = sorted(map(tuple, read_orc(spark, po).select(sorted(orders.columns)).collect()))
    b = sorted(
        map(tuple, spark.read.parquet(pp).select(sorted(orders.columns)).collect())
    )
    assert a == b and len(a) == 500

    # partition pruning reaches the ORC scan like it does parquet
    plan = (
        read_orc(spark, po)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan


def test_tar_members_contract(spark):
    """tar_members: plain and gzipped tarballs explode to file rows with
    verified md5 digests, symlinks surface with NULL digest, directory
    entries are skipped, junk bytes dead-letter as one parse_ok=false
    row."""
    import hashlib
    import io
    import tarfile

    from data_engineering_assignment_spark.sources import tar_members

    def build(mode):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode=mode) as tf:
            d = tarfile.TarInfo("keep/")
            d.type = tarfile.DIRTYPE
            tf.addfile(d)
            f = tarfile.TarInfo("keep/a.txt")
            body = b"hello tar"
            f.size = len(body)
            f.mtime = 1700000123
            tf.addfile(f, io.BytesIO(body))
            ln = tarfile.TarInfo("alias")
            ln.type = tarfile.SYMTYPE
            ln.linkname = "keep/a.txt"
            tf.addfile(ln)
        return buf.getvalue()

    df = spark.createDataFrame(
        [
            (1, bytearray(build("w"))),
            (2, bytearray(build("w:gz"))),
            (3, bytearray(b"definitely not a tarball")),
        ],
        "archive_id long, content binary",
    )
    rows = tar_members(df).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.archive_id, []).append(r)
    want_digest = hashlib.md5(b"hello tar").hexdigest()
    for aid in (1, 2):
        got = {r.member: r for r in by_id[aid]}
        assert set(got) == {"keep/a.txt", "alias"}  # dir skipped
        f = got["keep/a.txt"]
        assert (f.kind, f.size, f.mtime, f.content_digest, f.parse_ok) == (
            "file", 9, 1700000123, want_digest, True,
        )
        ln = got["alias"]
        assert (ln.kind, ln.content_digest) == ("sym", None)
    (dead,) = by_id[3]
    assert dead.parse_ok is False and dead.member is None


def _zip64_eocd_spliced(raw: bytes) -> bytes:
    """Rewrite a comment-less classic archive to route through the
    ZIP64 end-of-central-directory: insert an EOCD64 record + locator
    before the EOCD and blank the EOCD's counts/offsets to the 0xFFFF/
    0xFFFFFFFF sentinels — the layout every >4GiB crawl dump uses."""
    import struct

    assert raw[-22:-18] == b"PK\x05\x06"
    (n_disk, n_total, cd_size, cd_off) = struct.unpack(
        "<HHII", raw[-14:-2]
    )
    eocd64 = struct.pack(
        "<4sQHHIIQQQQ",
        b"PK\x06\x06", 44, 45, 45, 0, 0,
        n_disk, n_total, cd_size, cd_off,
    )
    locator = struct.pack(
        "<4sIQI", b"PK\x06\x07", 0, len(raw) - 22, 1
    )
    eocd = (
        b"PK\x05\x06" + b"\x00" * 4
        + b"\xff\xff\xff\xff"  # entry counts -> sentinel
        + b"\xff\xff\xff\xff\xff\xff\xff\xff"  # cd size/offset -> sentinel
        + b"\x00\x00"
    )
    return raw[:-22] + eocd64 + locator + eocd


def test_zip_members_zip64(spark):
    """zip_members reads ZIP64 archives: force_zip64 member layout
    (zip64 extra fields + 8-byte data descriptors) AND the spliced
    EOCD64/locator directory route; a truncated EOCD64 dead-letters."""
    import io
    import zipfile

    from data_engineering_assignment_spark.sources import zip_members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        with zf.open("a.bin", "w", force_zip64=True) as m:
            m.write(b"x" * 1000)
        zf.writestr("b.txt", b"y" * 10, zipfile.ZIP_DEFLATED)
    plain = buf.getvalue()
    spliced = _zip64_eocd_spliced(plain)
    # stdlib reads the spliced form (sanity before the Spark hop)
    assert zipfile.ZipFile(io.BytesIO(spliced)).namelist() == [
        "a.bin", "b.txt",
    ]
    df = spark.createDataFrame(
        [(1, plain), (2, spliced), (3, spliced[:-30])],
        "archive_id long, content binary",
    )
    rows = zip_members(df).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["archive_id"], []).append(r)
    for aid in (1, 2):
        got = sorted(
            (r["member"], r["size_uncompressed"], r["crc_ok"])
            for r in by_id[aid]
            if r["parse_ok"]
        )
        assert got == [("a.bin", 1000, True), ("b.txt", 10, True)]
    assert len(by_id[3]) == 1 and not by_id[3][0]["parse_ok"]

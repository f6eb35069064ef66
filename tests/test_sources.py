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

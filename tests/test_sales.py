"""Basic-1 sales pipeline tests on a hand-written pipe-delimited CSV."""

from __future__ import annotations

import pytest

from data_engineering_assignment_spark.pipelines import sales as sl

HEADER = (
    "title|publisher|developer|release_date|platform|total_sales|na_sales"
    "|japan_sales|pal_sales|other_sales|user_score|critic_score"
)

ROWS = [
    # in-window (2006-2015)
    "G1|PubA|Dev|01-03-2007|PS3|10.0|6.0|1.0|2.0|1.0|8.0|9.0",
    "G2|PubA|Dev|15-07-2010|X360|5.0|3.5|0.5|0.5|0.5|7.0|8.0",
    "G3|PubB|Dev|20-11-2012|PC|8.0|4.0|1.0|2.0|1.0|6.0|7.0",
    "G4|PubA|Dev|05-05-2009|Wii|2.0||0.5|1.0|0.5|5.0|6.0",  # null na_sales
    # out of window
    "G5|PubC|Dev|01-01-2000|PS1|50.0|30.0|10.0|5.0|5.0|9.0|9.0",
    "G6|PubA|Dev|01-01-2020|PS5|20.0|15.0|1.0|3.0|1.0|9.0|9.0",
]


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("sales") / "sales.csv"
    p.write_text("\n".join([HEADER, *ROWS]) + "\n")
    return str(p)


def test_schema_and_date_parse(spark, csv_path):
    df = sl.read_sales_csv(spark, csv_path)
    assert dict(df.dtypes)["release_date"] == "date"
    assert df.count() == 6


def test_best_publisher_and_null_count(spark, csv_path):
    windowed = sl.sales_in_window(sl.read_sales_csv(spark, csv_path))
    # PubA in-window NA: 6.0 + 3.5 + null = 9.5 > PubB 4.0; G5/G6 excluded
    best = sl.best_na_publisher(windowed)
    assert best == "PubA"
    assert sl.unknown_na_sales_count(windowed, best) == 1  # G4


def test_sales_per_year_rounded_ascending(spark, csv_path):
    windowed = sl.sales_in_window(sl.read_sales_csv(spark, csv_path))
    rows = sl.sales_per_year(windowed, "PubA").collect()
    assert [r["year"] for r in rows] == [2007, 2009, 2010]
    by_year = {r["year"]: (r["na_total"], r["global_total"]) for r in rows}
    assert by_year[2007] == (6.0, 10.0)
    assert by_year[2009] == (None, 2.0)  # sum of all-null na_sales is null

"""Color-UDF tests: exact D1/D2 semantics on hand-built BGRA buffers, and the
image analytics pipeline on synthetic images."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_assignment_spark.functions.colors import (
    color_name_of_hex,
    color_names_from_bgra,
    pixel_colors_udf,
    pixel_hex_udf,
)
from data_engineering_assignment_spark.pipelines import images as img


def bgra(b, g, r, a=255):
    return bytes([b, g, r, a])


def test_color_name_scalar_table():
    # BGRA order: blue=0000, green=00, red=FF, alpha=FF → pure red
    assert color_name_of_hex("0000FFFF") == "Red"
    assert color_name_of_hex("FF0000FF") == "Blue"
    assert color_name_of_hex("00FF00FF") == "Green"
    assert color_name_of_hex("00FFFFFF") == "Yellow"
    assert color_name_of_hex("FFFFFFFF") == "White"
    assert color_name_of_hex("000000FF") == "Black"
    assert color_name_of_hex("00000000") == "None"      # transparent
    assert color_name_of_hex("0000FF7F") == "None"      # alpha 127 < 128
    assert color_name_of_hex("0000FF80") == "Red"       # alpha 128 counts
    assert color_name_of_hex("junk") == "None"
    # rounding thresholds: 84→0, 85→128, 169→128, 170→255
    assert color_name_of_hex("545454FF") == "Black"     # 0x54=84 → all 0
    assert color_name_of_hex("555555FF") == "Gray"      # 0x55=85 → all 128
    assert color_name_of_hex("AAAAAAFF") == "White"     # 0xAA=170 → all 255


def test_batch_matches_scalar():
    data = (
        bgra(0, 0, 255) + bgra(255, 0, 0) + bgra(0, 255, 255)
        + bgra(0, 0, 0, 0) + bgra(128, 128, 128)
    )
    assert color_names_from_bgra(data) == ["Red", "Blue", "Yellow", "None", "Gray"]


def test_udfs_on_dataframe(spark):
    data = bgra(0, 0, 255) + bgra(255, 255, 255, 10)
    df = spark.createDataFrame([(1, data)], "id int, data binary")
    row = df.select(
        pixel_colors_udf("data").alias("colors"),
        pixel_hex_udf("data").alias("pixels"),
    ).collect()[0]
    assert row["colors"] == ["Red", "None"]
    assert row["pixels"] == ["0000FFFF", "FFFFFF0A"]
    # D2 parity: mapping the hex array through the scalar fn matches the batch
    assert [color_name_of_hex(h) for h in row["pixels"]] == row["colors"]


@pytest.fixture(scope="module")
def image_set(spark):
    def image(hexcode, annotation, group, color_counts):
        """color_counts: list of (colorname-pixel, count) as raw BGRA."""
        px = {
            "Red": bgra(0, 0, 255), "Blue": bgra(255, 0, 0),
            "Yellow": bgra(0, 255, 255), "Black": bgra(0, 0, 0),
            "White": bgra(255, 255, 255), "None": bgra(0, 0, 0, 0),
        }
        data = b"".join(px[c] * n for c, n in color_counts)
        return (hexcode, annotation, group, data)

    rows = [
        image("1F1E6", "flag: Testland", "flags",
              [("Blue", 30), ("White", 60), ("None", 10)]),
        image("1F3C0", "basketball", "activities",
              [("Red", 40), ("Black", 5), ("None", 55)]),
        image("1F3D3", "ping pong", "activities",
              [("Red", 10), ("White", 20), ("None", 70)]),
        image("1F4A9", "byb", "misc",
              [("Blue", 50), ("Yellow", 30), ("Black", 10), ("White", 5)]),
        image("1F4AA", "mostly-empty", "misc", [("Red", 1), ("None", 99)]),
    ]
    df = spark.createDataFrame(
        rows, "hexcode string, annotation string, group string, data binary"
    )
    return df.withColumn("colors", pixel_colors_udf("data"))


def test_most_colored_and_ratio(image_set):
    top = img.most_colored_images(image_set, n=2).collect()
    assert [r["annotation"] for r in top] == ["byb", "flag: Testland"]
    low = img.lowest_color_ratio_images(image_set, n=1).collect()
    assert low[0]["annotation"] == "mostly-empty"


def test_top_colors_with_shares(image_set):
    out = img.top_colors_with_shares(image_set, "flag: Testland", k=2).collect()
    assert [(r["color"], r["share_pct"]) for r in out] == [
        ("White", pytest.approx(66.67)),
        ("Blue", pytest.approx(33.33)),
    ]


def test_count_blue_yellow_black(image_set):
    n = img.count_images_with_top3(image_set, ["Blue", "Yellow", "Black"]).collect()[0]["n_images"]
    assert n == 1  # only "byb"


def test_top_red_in_group(image_set):
    out = img.top_red_pixel_images(image_set, group="activities", n=5).collect()
    assert [(r["annotation"], r["red_pixels"]) for r in out] == [
        ("basketball", 40), ("ping pong", 10)
    ]

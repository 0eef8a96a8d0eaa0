"""Text-analysis operator tests: semantics locked against hand-computed
values; Spark-vs-oracle equivalence is covered by the driver gate
(queries text_features / lang_confusion)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (1, "The cat and the dog sat of the mat and slept.", "en"),
        (2, "Der Hund und die Katze und der Vogel.", "de"),
        (3, "Le chat et le chien et les oiseaux.", "fr"),
        (4, "El perro y el gato y de la casa.", "es"),
        (5, "这是一个中文测试文档没有空格", "zh"),
        (6, "", "en"),
        (7, "   ", "en"),
        (8, "12345 67890 !!!", "en"),
        (9, "word", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lang_guess(spark, tdf):
    from rxtls_spark.functions.text import lang_guess

    got = {
        r["doc_id"]: r["g"]
        for r in tdf.select("doc_id", lang_guess().alias("g")).collect()
    }
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "es"
    assert got[5] == "zh"
    assert got[6] == "und"  # empty → no markers
    assert got[8] == "und"  # digits/punct only


def test_token_count(spark, tdf):
    from rxtls_spark.functions.text import token_count

    got = {
        r["doc_id"]: r["n"]
        for r in tdf.select("doc_id", token_count().alias("n")).collect()
    }
    assert got[1] == 11
    assert got[6] == 0
    assert got[7] == 0  # blank-only
    assert got[9] == 1


def test_quality_features_bounds(spark, tdf):
    from rxtls_spark.functions.text import quality_score

    rows = tdf.select(quality_score().alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_quality_prose_beats_noise(spark, tdf):
    from rxtls_spark.functions.text import quality_score

    got = {
        r["doc_id"]: r["q"]
        for r in tdf.select("doc_id", quality_score().alias("q")).collect()
    }
    assert got[1] > got[8]  # prose > digit noise

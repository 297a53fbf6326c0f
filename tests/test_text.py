"""Text-analysis operators: token/quality/langid/fingerprint/simhash."""

import pyspark.sql.functions as F

from bisque_spark.functions.text import (
    fingerprint_py,
    hamming64_col,
    langid_py,
    quality_cols,
    simhash_py,
    token_count_col,
)


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",)], ["text"]
    ).select(token_count_col("text").alias("n"))
    assert [r["n"] for r in df.collect()] == [3, 0, 0, 1]


def test_quality_cols(spark):
    df = spark.createDataFrame([("Hello, world! This is the test.",)], ["text"])
    q = quality_cols("text")
    row = df.select(
        q["n_tokens"].alias("nt"),
        q["punct_ratio"].alias("pr"),
        q["stopword_ratio"].alias("sr"),
        q["mean_token_len"].alias("ml"),
    ).first()
    assert row["nt"] == 6
    assert abs(row["pr"] - 3 / 31) < 1e-9  # ',' '!' '.'
    assert abs(row["sr"] - 2 / 6) < 1e-9  # 'is'? no — 'the','is'
    assert row["ml"] > 0


def test_langid():
    assert langid_py("the cat is in the house and it is big") == "en"
    assert langid_py("le chat est dans la maison et les arbres") == "fr"
    assert langid_py("der Hund ist nicht ein Tier mit der Katze") == "de"
    assert langid_py("") == "und"
    assert langid_py("zzz qqq xxx") == "und"


def test_fingerprint_whitespace_invariant():
    a = fingerprint_py("hello   world  foo bar baz quux longer text here")
    b = fingerprint_py("hello world foo bar baz quux longer text here")
    assert a == b
    assert fingerprint_py("completely different content") != a


def test_simhash_similarity():
    base = "spark frontier crawl image caption engine batch shuffle partition"
    near = base + " extra"
    far = "entirely unrelated words about cooking pasta tomatoes basil olive"
    h1, h2, h3 = simhash_py(base), simhash_py(near), simhash_py(far)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h1, h2) < ham(h1, h3)
    assert ham(h1, h1) == 0


def test_hamming_col_matches_python(spark):
    h1, h2 = simhash_py("a b c d"), simhash_py("a b c e")
    df = spark.createDataFrame([(h1, h2)], "a long, b long").select(
        hamming64_col(F.col("a"), F.col("b")).alias("d")
    )
    want = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
    assert df.first()["d"] == want

"""Parity pin: pure-Python xxh64 twin vs Spark's JVM F.xxhash64."""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from bisque_spark.hashing import xxhash64_str


def test_parity_with_spark(spark):
    cases = [
        "",
        "a",
        "abc",
        "http://example.com/",
        "x" * 7,
        "y" * 8,
        "z" * 31,
        "w" * 32,
        "q" * 33,
        "longer string for xxhash parity testing 1234567890" * 3,
        "üñîçødé ✓ — caf\xe9",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    for row in df.collect():
        assert xxhash64_str(row["s"]) == row["h"], row["s"]


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=100))
def test_deterministic(s):
    assert xxhash64_str(s) == xxhash64_str(s)
    assert -(2**63) <= xxhash64_str(s) < 2**63

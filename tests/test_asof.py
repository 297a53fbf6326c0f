"""As-of join vs pandas merge_asof (the reference semantics)."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from bisque_spark.operators.asof import asof_join


def _data():
    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "user_id": rng.randint(0, 5, 60),
            "ts": rng.randint(0, 1000, 60).astype("float64"),
            "lvalue": rng.random(60).round(3),
        }
    ).drop_duplicates(["user_id", "ts"])
    right = pd.DataFrame(
        {
            "user_id": rng.randint(0, 5, 40),
            "ts": rng.randint(0, 1000, 40).astype("float64"),
            "rvalue": rng.random(40).round(3),
        }
    ).drop_duplicates(["user_id", "ts"])
    return left, right


def test_asof_matches_pandas(spark):
    left, right = _data()
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
        suffixes=("", "_right"),
    )
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = asof_join(ldf, rdf, on="ts", by="user_id", value_cols=["rvalue"])
    got_map = {
        (r["user_id"], r["ts"]): (r["rvalue_right"], r["ts_right"])
        for r in got.collect()
    }
    for _, row in want.iterrows():
        g_val, _g_ts = got_map[(row["user_id"], row["ts"])]
        if pd.isna(row["rvalue"]):
            assert g_val is None, row
        else:
            assert g_val is not None and abs(g_val - row["rvalue"]) < 1e-12, row


def test_asof_inclusive_tie(spark):
    ldf = spark.createDataFrame([(1, 10.0, "L")], "user_id int, ts double, l string")
    rdf = spark.createDataFrame([(1, 10.0, "R")], "user_id int, ts double, r string")
    got = asof_join(ldf, rdf, on="ts", by="user_id", value_cols=["r"]).first()
    assert got["r_right"] == "R"  # equal timestamp matches (inclusive)


def test_asof_null_right_value_attaches_matched_row(spark):
    """A NULL in the matched right row must come through as NULL — not
    be back-filled from an older right row (pandas/DuckDB semantics;
    ADVICE r01: per-column fill mixed rows)."""
    ldf = spark.createDataFrame([(1, 3.0)], "user_id int, ts double")
    rdf = spark.createDataFrame(
        [(1, 1.0, 5.0), (1, 2.0, None)], "user_id int, ts double, v double"
    )
    got = asof_join(ldf, rdf, on="ts", by="user_id", value_cols=["v"]).first()
    assert got["ts_right"] == 2.0
    assert got["v_right"] is None

    want = pd.merge_asof(
        pd.DataFrame({"user_id": [1], "ts": [3.0]}),
        pd.DataFrame({"user_id": [1, 1], "ts": [1.0, 2.0], "v": [5.0, None]}),
        on="ts",
        by="user_id",
        suffixes=("", "_right"),
    )
    assert pd.isna(want["v"].iloc[0])


def test_asof_right_ties_deterministic(spark):
    """Right-side ties on (by, ts): max-struct wins, every run."""
    ldf = spark.createDataFrame([(1, 10.0)], "user_id int, ts double")
    rows = [(1, 10.0, float(v)) for v in (3, 1, 7, 5)]
    vals = set()
    for _ in range(3):
        rdf = spark.createDataFrame(
            rows, "user_id int, ts double, v double"
        ).repartition(8)
        got = asof_join(ldf, rdf, on="ts", by="user_id", value_cols=["v"]).first()
        vals.add(got["v_right"])
    assert vals == {7.0}


def test_asof_null_on_key_right_rows_never_match(spark):
    """A right row with NULL ts must never match (DuckDB ASOF / pandas
    semantics) — without the filter it would forward-fill everything."""
    import duckdb

    ldf = spark.createDataFrame([(1, 3.0)], "user_id int, ts double")
    rdf = spark.createDataFrame(
        [(1, None, 99.0), (1, 1.0, 5.0)], "user_id int, ts double, v double"
    )
    got = asof_join(ldf, rdf, on="ts", by="user_id", value_cols=["v"]).first()
    assert got["v_right"] == 5.0 and got["ts_right"] == 1.0
    want = duckdb.sql(
        """
        SELECT r.v FROM (VALUES (1, 3.0)) l(user_id, ts)
        ASOF LEFT JOIN (VALUES (1, NULL, 99.0), (1, 1.0, 5.0)) r(user_id, ts, v)
        ON l.user_id = r.user_id AND l.ts >= r.ts
        """
    ).fetchone()
    assert want[0] == 5.0

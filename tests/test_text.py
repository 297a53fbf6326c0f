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


def test_vectorized_series_match_python_twins():
    """The Arrow-batch bodies (one xxh64_vec call per batch) must be
    bit-identical to the per-row Python twins — the round-1→round-2
    no-behavior-change pin (VERDICT r01 next-round #2)."""
    import pandas as pd

    from bisque_spark.functions.text import (
        _fingerprint_series,
        _simhash_series,
    )
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.text(max_size=120)),
            min_size=1,
            max_size=8,
        )
    )
    def check(texts):
        fp = _fingerprint_series(pd.Series(texts, dtype=object))
        sh = _simhash_series(pd.Series(texts, dtype=object))
        for t, g_fp, g_sh in zip(texts, fp, sh):
            if t is None:
                assert pd.isna(g_fp)  # null in → null out (VERDICT r02 #8)
            else:
                assert g_fp == fingerprint_py(t)
            assert g_sh == (simhash_py(t) if t else 0)

    check()


def test_fingerprint_null_row_through_spark(spark):
    """Null text survives the Arrow round-trip as SQL NULL, not a
    hash-of-empty sentinel (VERDICT r02 Next-round #8)."""
    import pyspark.sql.functions as F

    from bisque_spark.functions.text import fingerprint_udf

    df = spark.createDataFrame(
        [(1, "hello world fingerprint text"), (2, None)], "id long, text string"
    )
    rows = {
        r["id"]: r["fp"]
        for r in df.select("id", fingerprint_udf(F.col("text")).alias("fp")).collect()
    }
    assert rows[2] is None
    assert rows[1] == fingerprint_py("hello world fingerprint text")


def test_langid_col_matches_python(spark):
    """JVM langid (pure Column expr) == langid_py on every document."""
    import pyspark.sql.functions as F

    from bisque_spark.functions.text import langid_col

    texts = [
        "the cat is in the house and it is big",
        "le chat est dans la maison et les arbres",
        "der Hund ist nicht ein Tier mit der Katze",
        "el perro es un animal y los gatos",
        "",
        None,
        "zzz qqq xxx",
        "the le der el",  # 1-each tie -> first sorted lang ('de')
        "Uppercase THE AND TO in is it",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r["i"]: r["lang"] for r in df.select("i", langid_col("t").alias("lang")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == (langid_py(t) if t is not None else "und"), (i, t, got[i])


def test_bpe_token_count(spark):
    """BPE-ish pretokenizer count: Spark (Java regex) == DuckDB (RE2)
    over unicode/punctuation/contraction samples; ws/empty/null edges."""
    import duckdb
    import pyspark.sql.functions as F

    from bisque_spark.functions.text import BPE_PRETOKEN_PATTERN, bpe_token_count_col

    texts = [
        "It's 2026 — café №5 costs $3.50, right?",
        "",
        None,
        "a  b\t\nc",
        "don't you'll we've",
        "日本語 テスト 123",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "i int, t string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", bpe_token_count_col("t").alias("n")).collect()
    }
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] is None
            continue
        want = duckdb.sql(
            "SELECT len(list_filter(regexp_extract_all($1, $$"
            + BPE_PRETOKEN_PATTERN
            + "$$), p -> trim(p) != ''))",
            params=[t],
        ).fetchone()[0]
        assert got[i] == want, (t, got[i], want)


def test_corpus_unigram_logprob_matches_duckdb(spark):
    """LM-quality scoring hash-verified against an in-process DuckDB
    oracle (same hard signal as the driver's graded queries), plus the
    semantic property: a junk document of corpus-unique tokens scores
    strictly below every natural document."""
    import duckdb

    from bisque_spark.functions.text import corpus_unigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "the cat and the dog"),
        (4, "zxqj vwpk qqzz xkcd"),  # junk: every token unique
        (5, "   "),                   # whitespace-only → no tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_toks"], round(r["mean_logprob"], 6))
        for r in corpus_unigram_logprob(docs).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", rows)
    want = {
        d: (n, round(p, 6))
        for d, n, p in con.execute("""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                FROM documents WHERE length(trim(text)) > 0
            ), counts AS (
                SELECT tok, count(*) AS c FROM toks GROUP BY tok
            ), total AS (SELECT count(*) AS n FROM toks)
            SELECT doc_id, count(*) AS n_toks,
                   avg(ln(c * 1.0 / n)) AS mean_logprob
            FROM toks JOIN counts USING (tok) CROSS JOIN total
            GROUP BY doc_id
        """).fetchall()
    }
    assert got == want
    assert 5 not in got  # token-less docs have no distribution to score
    junk, natural = got[4][1], [got[i][1] for i in (1, 2, 3)]
    assert all(junk < p for p in natural)


def test_repetition_cols_match_python_oracle(spark):
    """Gopher-style repetition signals vs a direct Python computation
    of the same definitions."""
    from bisque_spark.functions.text import repetition_cols

    rows = [
        (1, "buy now\nbuy now\nbuy now\nunique line"),
        (2, "alpha beta\ngamma delta"),
        (3, "spam ham spam ham spam ham spam ham"),
        (4, ""),
        (5, "one\n\none"),  # blank lines ignored
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = repetition_cols("text")
    got = {
        row["doc_id"]: (
            round(row["dlf"], 6), round(row["dlcf"], 6), round(row["t2f"], 6)
        )
        for row in docs.select(
            "doc_id",
            r["dup_line_frac"].alias("dlf"),
            r["dup_line_char_frac"].alias("dlcf"),
            r["top_2gram_frac"].alias("t2f"),
        ).collect()
    }

    def oracle(text):
        lines = [ln for ln in text.split("\n") if ln.strip()]
        toks = text.split()
        if lines:
            dlf = 1.0 - len(set(lines)) / len(lines)
            total = sum(len(ln) for ln in lines)
            once = sum(len(ln) for ln in set(lines) if lines.count(ln) == 1)
            dlcf = (total - once) / total if total else 0.0
        else:
            dlf = dlcf = 0.0
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        t2f = (
            min(1.0, 2.0 * max(grams.count(g) for g in set(grams)) / len(toks))
            if grams else 0.0
        )
        return (round(dlf, 6), round(dlcf, 6), round(t2f, 6))

    for doc_id, text in rows:
        assert got[doc_id] == oracle(text), doc_id
    # the boilerplate doc is flagged hard
    assert got[1][0] >= 0.5 and got[1][1] >= 0.5
    assert got[3][2] == 1.0  # one dominant 2-gram covers everything


def test_scrub_pii_col(spark):
    from bisque_spark.functions.text import scrub_pii_col

    rows = [
        (1, "contact me at jane.doe+x@example.co.uk today"),
        (2, "call +1 (555) 123-4567 or 555-987-6543"),
        (3, "server at 192.168.1.100 responded"),
        (4, "no pii here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean"]
        for r in docs.select(
            "doc_id", scrub_pii_col("text").alias("clean")
        ).collect()
    }
    assert got[1] == "contact me at <EMAIL> today"
    assert got[2] == "call <PHONE> or <PHONE>"
    assert got[3] == "server at <IP> responded"
    assert got[4] == "no pii here at all"


def test_repetition_stats_equals_column_form(spark):
    """The relational (explode+groupBy, linear) form must agree exactly
    with the per-document Column form on every signal — including
    empty and blank-line documents."""
    from bisque_spark.functions.text import repetition_cols, repetition_stats

    rows = [
        (1, "buy now\nbuy now\nbuy now\nunique line"),
        (2, "alpha beta\ngamma delta"),
        (3, "spam ham spam ham spam ham spam ham"),
        (4, ""),
        (5, "one\n\none"),
        (6, "solo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = repetition_cols("text")
    col_form = {
        row["doc_id"]: (
            round(row["a"], 9), round(row["b"], 9), round(row["c"], 9)
        )
        for row in docs.select(
            "doc_id",
            r["dup_line_frac"].alias("a"),
            r["dup_line_char_frac"].alias("b"),
            r["top_2gram_frac"].alias("c"),
        ).collect()
    }
    rel_form = {
        row["doc_id"]: (
            round(row["dup_line_frac"], 9),
            round(row["dup_line_char_frac"], 9),
            round(row["top_2gram_frac"], 9),
        )
        for row in repetition_stats(docs).collect()
    }
    assert rel_form == col_form


# ---- corpus-level line dedup (CCNet preprocessing step) --------------------


def _dedup_lines_py(rows, min_chars=6):
    """Independent Python oracle: keeper per long line = min (id, idx)."""
    keeper = {}
    for did, text in rows:
        for i, line in enumerate((text or "").split("\n")):
            if len(line) >= min_chars:
                k = keeper.get(line)
                if k is None or (did, i) < k:
                    keeper[line] = (did, i)
    out = {}
    for did, text in rows:
        lines = (text or "").split("\n")
        kept = [
            line
            for i, line in enumerate(lines)
            if len(line) < min_chars or keeper[line] == (did, i)
        ]
        out[did] = ("\n".join(kept), len(lines), len(kept))
    return out


def test_dedup_lines_corpus_matches_python_oracle(spark):
    from bisque_spark.functions.text import dedup_lines_corpus

    boiler = "Accept cookies to continue browsing"
    nav = "Home | About | Contact"
    rows = [
        (1, f"{boiler}\nunique first doc line\n{nav}"),
        (2, f"{boiler}\nsecond doc body\n{nav}\n-\n"),
        (3, f"third doc body\n{boiler}"),
        (4, ""),
        (5, None),
        (6, "-\n-\n-"),  # short lines: never deduplicated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_lines_kept"])
        for r in dedup_lines_corpus(df).collect()
    }
    want = _dedup_lines_py(rows)
    assert got == want
    # the boilerplate survives exactly once, in the (id, idx)-first doc
    assert boiler in got[1][0]
    assert boiler not in got[2][0] and boiler not in got[3][0]
    assert got[6][0] == "-\n-\n-"  # short lines untouched


def test_dedup_lines_corpus_idempotent_and_testdata(spark):
    from bisque_spark.functions.text import dedup_lines_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    once = dedup_lines_corpus(docs).select("doc_id", "text")
    rows1 = {r["doc_id"]: r["text"] for r in once.collect()}
    want = _dedup_lines_py(
        [(r["doc_id"], r["text"]) for r in
         docs.select("doc_id", "text").collect()]
    )
    assert rows1 == {k: v[0] for k, v in want.items()}
    # idempotence: every surviving long line is now globally unique
    twice = dedup_lines_corpus(
        once.withColumnRenamed("text", "text")
    ).select("doc_id", "text")
    rows2 = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert rows2 == rows1


def test_compression_ratio_signal(spark):
    """zlib-ratio quality signal: repeated boilerplate compresses far
    below natural text; Spark output == the Python twin exactly."""
    import numpy as np

    from bisque_spark.functions.text import (
        compression_ratio_py,
        compression_ratio_udf,
    )

    rng = np.random.RandomState(4)
    natural = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sailors argue about the weather in a harbor tavern tonight"
    )
    rows = [
        (1, "click here to accept cookies\n" * 60),          # boilerplate
        (2, " ".join(natural.split()[i % 20] for i in range(300))),
        (3, "".join(chr(rng.randint(0x21, 0x7F)) for _ in range(800))),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["ratio"]
        for r in df.select(
            "doc_id", compression_ratio_udf(F.col("text")).alias("ratio")
        ).collect()
    }
    for did, text in rows:
        assert got[did] == compression_ratio_py(text or ""), did
    assert got[1] < 0.1          # repeated boilerplate: crushed
    assert got[1] < got[2] < got[3]  # monotone in redundancy
    assert got[3] > 0.8          # random chars: near-incompressible
    assert got[4] == got[5] == 1.0


def test_dedup_lines_corpus_hypothesis_differential(spark):
    """Randomized corpora (shared/unique/short/unicode/empty lines)
    against the Python oracle — one Spark run over a hypothesis-grade
    generated batch (per-example Spark jobs would be prohibitive)."""
    import random

    from bisque_spark.functions.text import dedup_lines_corpus

    rng = random.Random(77)
    pool = (
        ["shared boilerplate line one", "another common footer line",
         "Ünïcode shared line ✓ with marks", "tail boilerplate"]
        + [f"unique-{i} body line with words" for i in range(40)]
        + ["-", "", "x", "☂"]  # short: never deduplicated
    )
    rows = []
    for did in range(60):
        n = rng.randrange(0, 7)
        text = "\n".join(rng.choice(pool) for _ in range(n)) if n else ""
        rows.append((did, text if rng.random() > 0.05 else None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_lines_kept"])
        for r in dedup_lines_corpus(df).collect()
    }
    assert got == _dedup_lines_py(rows)


# ---- corpus substring (k-token window) dedup -----------------------------


def _span_oracle(rows, k):
    """Independent python twin of dedup_spans_corpus' policy."""
    import re

    toks = {
        i: (re.split(r"\s+", t.strip()) if t and t.strip() else [])
        for i, t in rows
    }
    occ = {}
    for i in toks:
        ts = toks[i]
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p : p + k]), []).append((i, p))
    dropped = {i: set() for i in toks}
    for positions in occ.values():
        keeper = min(positions)
        for (i, p) in positions:
            if (i, p) != keeper:
                dropped[i].update(range(p, p + k))
    out = {}
    for i, ts in toks.items():
        keep = [t for p, t in enumerate(ts) if p not in dropped[i]]
        out[i] = (" ".join(keep), len(ts), len(keep))
    return out


def test_dedup_spans_planted_passage(spark):
    from bisque_spark.functions.text import dedup_spans_corpus

    passage = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, f"alpha beta gamma {passage} delta epsilon zeta eta theta"),
        (2, f"one two three four {passage} five six seven eight nine"),
        (3, f"red green blue {passage} cyan magenta yellow black white"),
        (4, "too short for any window"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_tokens_kept"])
        for r in dedup_spans_corpus(df, k=8).collect()
    }
    want = _span_oracle(rows, k=8)
    assert got == want
    # doc 1 keeps the passage; docs 2-3 lose exactly its 10 tokens
    assert passage in got[1][0]
    for i in (2, 3):
        assert passage not in got[i][0]
        assert got[i][2] == got[i][1] - 10
    assert got[4] == ("too short for any window", 5, 5)
    assert got[5] == ("", 0, 0)


def test_dedup_spans_random_corpus_matches_oracle(spark):
    import numpy as np

    from bisque_spark.functions.text import dedup_spans_corpus

    rng = np.random.RandomState(5)
    pool = ["w%d" % i for i in range(12)]  # tiny pool → real collisions
    rows = [
        (int(i), " ".join(rng.choice(pool, size=rng.randint(3, 40))))
        for i in range(30)
    ]
    # plant one shared k-window so the cut path is exercised for sure
    shared = " ".join(pool[:6])
    rows[7] = (7, rows[7][1] + " " + shared)
    rows[19] = (19, shared + " " + rows[19][1])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k = 6
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_tokens_kept"])
        for r in dedup_spans_corpus(df, k=k).collect()
    }
    assert got == _span_oracle(rows, k)
    # sanity: something was actually cut somewhere
    assert any(g[2] < g[1] for g in got.values())

"""Mutation rewrites vs the reference performing the same mutation:
mutate → serialize must byte-equal bisque's mutate → decode."""

import pyspark.sql.functions as F

from bisque_spark.operators.mutate import (
    decompose,
    extract_subtree,
    replace_with_text,
    smooth,
    smooth_nodes_df,
    unwrap,
)
from bisque_spark.parse import find_all, parse_nodes, serialize_nodes
from ref_oracle import ref_soup

DOC = (
    '<div><p class="x">one</p><script>junk()</script>'
    "<span><b>two</b> three</span><p>four</p></div>"
)


def test_decompose_matches_reference():
    nodes = parse_nodes(DOC)
    script = find_all(nodes, "script")[0]
    got = serialize_nodes(decompose(nodes, script["pos"]))
    soup = ref_soup(DOC)
    soup.find("script").decompose()
    assert got == soup.decode()


def test_extract_matches_reference():
    nodes = parse_nodes(DOC)
    span = find_all(nodes, "span")[0]
    remaining, extracted = extract_subtree(nodes, span["pos"])
    soup = ref_soup(DOC)
    ripped = soup.find("span").extract()
    assert serialize_nodes(remaining) == soup.decode()
    assert serialize_nodes(extracted) == ripped.decode()


def test_replace_with_matches_reference():
    nodes = parse_nodes(DOC)
    span = find_all(nodes, "span")[0]
    got = serialize_nodes(replace_with_text(nodes, span["pos"], "REPLACED"))
    soup = ref_soup(DOC)
    soup.find("span").replace_with("REPLACED")
    assert got == soup.decode()


def test_unwrap_matches_reference():
    nodes = parse_nodes(DOC)
    span = find_all(nodes, "span")[0]
    got = serialize_nodes(unwrap(nodes, span["pos"]))
    soup = ref_soup(DOC)
    soup.find("span").unwrap()
    assert got == soup.decode()


def test_smooth_matches_reference():
    doc = "<p>a<b>x</b>c</p><p>d</p>"
    nodes = parse_nodes(doc)
    b = find_all(nodes, "b")[0]
    # removing <b> leaves adjacent 'a' and 'c' text runs to merge
    mutated = smooth(decompose(nodes, b["pos"]))
    soup = ref_soup(doc)
    soup.find("b").decompose()
    soup.smooth()
    assert serialize_nodes(mutated) == soup.decode()
    texts = [n for n in mutated if n["kind"] == "text"]
    assert [t["text"] for t in texts] == ["ac", "d"]


def test_smooth_df_merges_runs(spark):
    doc = "<p>a<b>x</b>c</p>"
    nodes = parse_nodes(doc)
    b = find_all(nodes, "b")[0]
    cut = decompose(nodes, b["pos"])
    from bisque_spark.operators.nodes import NODES_SCHEMA, _FIELDS

    rows = [tuple({**n, "url": "u"}[k] for k in _FIELDS) for n in cut]
    df = spark.createDataFrame(rows, schema=NODES_SCHEMA)
    smoothed = smooth_nodes_df(df)
    texts = sorted(
        r["text"] for r in smoothed.where(F.col("kind") == "text").collect()
    )
    assert texts == ["ac"]

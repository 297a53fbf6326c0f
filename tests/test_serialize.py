"""Serialization sink: parse → serialize must byte-equal the reference's
``str(soup)`` (the reference test harness's own round-trip invariant,
tests/__init__.py:106-129)."""

import glob
import sys

from bisque_spark.parse import parse_nodes, serialize_nodes
from ref_oracle import ref_soup
from test_parse import CORPUS


def _docs():
    docs = list(CORPUS)
    sys.path.insert(0, "/root/reference/src")
    from bisque.tests import BAD_DOCUMENT

    docs.append(BAD_DOCUMENT)
    for f in sorted(glob.glob("/root/reference/src/bisque/tests/fuzz/*.testcase")):
        try:
            docs.append(open(f, "rb").read().decode("utf-8"))
        except UnicodeDecodeError:
            pass
    return docs


def test_serialize_byte_equal_reference():
    checked = 0
    for doc in _docs():
        try:
            want = ref_soup(doc).decode()
        except Exception:
            continue
        assert serialize_nodes(parse_nodes(doc)) == want
        checked += 1
    assert checked >= 20


def test_prettify_byte_equal_reference():
    from bisque_spark.parse import prettify_nodes

    checked = 0
    for doc in _docs() + ["<div><p>a <b>x</b></p><pre> keep  </pre><br/></div>"]:
        try:
            want = ref_soup(doc).prettify()
        except Exception:
            continue
        assert prettify_nodes(parse_nodes(doc)) == want
        checked += 1
    assert checked >= 20


def test_decode_contents_matches_reference():
    from bisque_spark.parse import find_all, serialize_contents

    doc = '<div id="x"><p>a</p><b>c</b></div><div>other</div>'
    nodes = parse_nodes(doc)
    div = find_all(nodes, "div")[0]
    want = ref_soup(doc).find("div").decode_contents()
    assert serialize_contents(nodes, div["pos"]) == want


def test_on_duplicate_attribute_matches_reference():
    import sys

    sys.path.insert(0, "/root/reference/src")
    from bisque import Bisque

    doc = '<a href="first" href="second">x</a>'
    for strategy in ("replace", "ignore"):
        soup = Bisque(
            doc, features="html.parser", on_duplicate_attribute=strategy
        )
        want = soup.find("a")["href"]
        nodes = parse_nodes(doc, on_duplicate_attribute=strategy)
        from bisque_spark.parse import find_all

        got = find_all(nodes, "a")[0]["attrs"]["href"]
        assert got == want, strategy


def test_encode_matches_reference():
    from bisque_spark.parse import encode_nodes

    doc = "<p>café ☃ naïve</p>"
    for enc in ("utf-8", "ascii", "windows-1252"):
        want = ref_soup(doc).encode(enc)
        assert encode_nodes(parse_nodes(doc), enc) == want, enc


def test_serialize_details():
    # attr sorting, quote selection, multi-valued join, void elements
    doc = """<img z="1" a='x "q" y' class="b  a"><p>&lt;tag&gt; &amp; more</p>"""
    assert serialize_nodes(parse_nodes(doc)) == ref_soup(doc).decode()
    # script content not escaped; style too
    doc2 = "<script>if (a && b < c) {}</script><style>a>b{}</style>"
    assert serialize_nodes(parse_nodes(doc2)) == ref_soup(doc2).decode()
    # idempotent re-parse (fixpoint)
    once = serialize_nodes(parse_nodes(doc2))
    assert serialize_nodes(parse_nodes(once)) == once

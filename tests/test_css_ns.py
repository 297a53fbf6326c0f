"""CSS namespace selectors (the last selector gap, VERDICT r3 #4).

Reference semantics: chinois/soupsieve matching over lxml-resolved
namespaces, with ``Tag.namespaces`` (prefixed declarations, first one
wins) as the default prefix dict (reference css.py:60-67,
_lxml/xml_builder.py:57-79). The stdlib tree carries no resolved URIs,
but every ``xmlns``/``xmlns:p`` declaration IS in the attributes the
parser already sees — resolution happens per element at match time.
"""

from bisque_spark.functions.css import (
    CompiledSelector,
    doc_namespaces,
    select,
    select_stage,
)
from bisque_spark.parse import parse_nodes

SVG = "http://www.w3.org/2000/svg"
XLINK = "http://www.w3.org/1999/xlink"

DOC = (
    '<root xmlns:svg="http://www.w3.org/2000/svg" '
    'xmlns:xl="http://www.w3.org/1999/xlink">'
    "<svg:rect id='r1'/><svg:circle/>"
    "<rect id='plain'/>"
    '<a xl:href="/x">link</a>'
    "</root>"
)


def _names(hits):
    return [h["name"] for h in hits]


def _ids(hits):
    return [(h["attrs"] or {}).get("id") for h in hits]


def test_ns_tag_with_explicit_dict():
    nodes = parse_nodes(DOC)
    hits = select(nodes, "s|rect", namespaces={"s": SVG})
    assert _ids(hits) == ["r1"]
    # selector prefix need not equal the document prefix — only URIs
    hits2 = select(nodes, "weird|circle", namespaces={"weird": SVG})
    assert _names(hits2) == ["svg:circle"]


def test_ns_tag_doc_derived_default():
    """No namespaces= → the document's own xmlns:p declarations bind
    the prefixes (reference Tag.namespaces behavior)."""
    nodes = parse_nodes(DOC)
    assert doc_namespaces(nodes)["svg"] == SVG
    assert _ids(select(nodes, "svg|rect")) == ["r1"]
    assert _names(select(nodes, "svg|*")) == ["svg:rect", "svg:circle"]


def test_no_namespace_and_any_namespace_forms():
    nodes = parse_nodes(DOC)
    # |rect: element with NO namespace only
    assert _ids(select(nodes, "|rect")) == ["plain"]
    # *|rect: any namespace
    assert _ids(select(nodes, "*|rect")) == ["r1", "plain"]
    # plain rect with no default ns in dict: namespace-agnostic
    assert _ids(select(nodes, "rect")) == ["r1", "plain"]


def test_unknown_prefix_matches_nothing():
    nodes = parse_nodes(DOC)
    assert select(nodes, "nope|rect", namespaces={"s": SVG}) == []


def test_attr_namespace_selectors():
    nodes = parse_nodes(DOC)
    # [ns|attr] resolves BOTH the selector prefix (via the dict) and
    # the document prefix (via in-scope xmlns) to URIs
    hits = select(nodes, "[link|href]", namespaces={"link": XLINK})
    assert _names(hits) == ["a"]
    assert _names(select(nodes, "[xl|href='/x']")) == ["a"]
    assert select(nodes, "[xl|href='/y']") == []
    # [*|attr]: any (or no) prefix with that local name
    assert _names(select(nodes, "[*|href]")) == ["a"]
    # unprefixed [href] binds the literal key — xl:href is not 'href'
    assert select(nodes, "[href]") == []


def test_default_namespace_constrains_plain_tags():
    doc = (
        '<root><svg xmlns="http://www.w3.org/2000/svg">'
        "<rect id='in-svg'/></svg><rect id='no-ns'/></root>"
    )
    nodes = parse_nodes(doc)
    # with a default '' binding, unprefixed selectors require that URI
    hits = select(nodes, "rect", namespaces={"": SVG})
    assert _ids(hits) == ["in-svg"]
    # |rect still means NO namespace
    assert _ids(select(nodes, "|rect", namespaces={"": SVG})) == ["no-ns"]
    # and without the dict, default xmlns still flows to elements:
    assert _ids(select(nodes, "s|rect", namespaces={"s": SVG})) == ["in-svg"]


def test_xmlns_scoping_and_redeclaration():
    doc = (
        '<root xmlns:p="uri:one">'
        "<p:x id='outer'/>"
        '<mid xmlns:p="uri:two"><p:x id="inner"/></mid>'
        "<p:x id='outer2'/>"
        "</root>"
    )
    nodes = parse_nodes(doc)
    assert _ids(select(nodes, "a|x", namespaces={"a": "uri:one"})) == [
        "outer",
        "outer2",
    ]
    assert _ids(select(nodes, "a|x", namespaces={"a": "uri:two"})) == ["inner"]
    # doc-derived dict: FIRST declaration of a prefix wins (reference
    # _register_namespaces semantics)
    assert doc_namespaces(nodes)["p"] == "uri:one"
    assert _ids(select(nodes, "p|x")) == ["outer", "outer2"]


def test_implicit_xml_prefix():
    doc = '<root><d xml:lang="en">x</d><d>y</d></root>'
    nodes = parse_nodes(doc)
    assert _names(select(nodes, "[xml|lang=en]")) == ["d"]
    assert select(nodes, "[xml|lang=fr]") == []


def test_ns_in_functional_pseudo_and_compiled():
    nodes = parse_nodes(DOC)
    sel = CompiledSelector(":is(s|rect, |rect)", namespaces={"s": SVG})
    assert _ids(sel.select(nodes)) == ["r1", "plain"]
    # compiled without namespaces → doc-derived per document
    sel2 = CompiledSelector("svg|circle")
    assert _names(sel2.select(nodes)) == ["svg:circle"]


def test_select_stage_namespaces(spark):
    pages = spark.createDataFrame(
        [("u1", DOC), ("u2", "<root><rect id='q'/></root>")],
        "url string, html string",
    )
    hits = select_stage(pages, "s|rect", namespaces={"s": SVG}).collect()
    assert [(r["url"], r["name"]) for r in hits] == [("u1", "svg:rect")]
    # doc-derived: each document binds its own declared prefixes
    hits2 = select_stage(pages, "svg|*").collect()
    assert sorted(r["name"] for r in hits2) == ["svg:circle", "svg:rect"]


def test_html_path_unchanged():
    """Plain HTML selectors (no colons anywhere) behave identically:
    the namespace machinery must not perturb the level-3/4 engine."""
    doc = '<div class="a"><p id="x">t</p><p>u</p></div>'
    nodes = parse_nodes(doc)
    assert _ids(select(nodes, "div.a > p:first-child")) == ["x"]
    assert len(select(nodes, "p")) == 2

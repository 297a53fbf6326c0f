"""Differential property test for the CSS selector engine.

`select()` evaluates chains against _DocIndex structures (subtree
ranges, per-parent orderings). This file re-implements the same
semantics as a deliberately NAIVE evaluator — per-node list scans and
ancestor walks, no index — and hypothesis-compares the two on random
documents × random selectors. Shared tokenizer (parse_selector), so
the differential targets the EVALUATORS: sibling indexing, subtree
bounds, scope anchoring for :has(), :is() recursion.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from bisque_spark.functions.css import parse_selector, select
from bisque_spark.parse import parse_nodes

# ---- naive evaluator ---------------------------------------------------------


def _tag_kids(nodes, parent_pos):
    return [
        n
        for n in nodes
        if n["kind"] == "tag" and n["parent_pos"] == parent_pos
    ]


def _ancestors(nodes, node):
    p = node["parent_pos"]
    while p >= 0:
        yield nodes[p]
        p = nodes[p]["parent_pos"]


def _nth_ok(ab, idx):
    a, b = ab
    if a == 0:
        return idx == b
    n, rem = divmod(idx - b, a)
    return rem == 0 and n >= 0


def _n_simple(nodes, node, s):
    if node["kind"] != "tag":
        return False
    attrs = node["attrs"] or {}
    if s.tag is not None and node["name"] != s.tag:
        return False
    for i in s.ids:
        if attrs.get("id") != i:
            return False
    if s.classes:
        have = (attrs.get("class") or "").split()
        if not all(c in have for c in s.classes):
            return False
    for name, op, want, flag, _ns in s.attrs:  # _ns always None here:
        # the generator's selector alphabet has no namespace tokens
        if name not in attrs:
            return False
        raw = attrs[name]
        if op is not None and want is not None:
            r, w = (raw.lower(), want.lower()) if flag == "i" else (raw, want)
            if op == "=" and r != w:
                return False
    sibs = _tag_kids(nodes, node["parent_pos"])
    idx = [n["pos"] for n in sibs].index(node["pos"]) + 1
    same_type = [n for n in sibs if n["name"] == node["name"]]
    tidx = [n["pos"] for n in same_type].index(node["pos"]) + 1
    if s.nth_of_type is not None and tidx != s.nth_of_type:
        return False
    if s.nth_child is not None and not _nth_ok(s.nth_child, idx):
        return False
    if s.nth_last_child is not None and not _nth_ok(
        s.nth_last_child, len(sibs) - idx + 1
    ):
        return False
    if s.nth_last_of_type is not None and not _nth_ok(
        s.nth_last_of_type, len(same_type) - tidx + 1
    ):
        return False
    if s.last_child and idx != len(sibs):
        return False
    if s.last_of_type and tidx != len(same_type):
        return False
    if s.only_child and len(sibs) != 1:
        return False
    if s.only_of_type and len(same_type) != 1:
        return False
    for neg in s.negated:
        if _n_simple(nodes, node, neg):
            return False
    for groups in s.is_groups:
        if not any(_n_chain(nodes, node, ch) for ch in groups):
            return False
    for groups in s.has_groups:
        if not _n_has(nodes, node, groups):
            return False
    return True


def _n_chain(nodes, node, chain):
    comb, simple = chain[-1]
    if not _n_simple(nodes, node, simple):
        return False
    if len(chain) == 1:
        return True
    rest = chain[:-1]
    if comb == " ":
        return any(_n_chain(nodes, a, rest) for a in _ancestors(nodes, node))
    if comb == ">":
        p = node["parent_pos"]
        return p >= 0 and _n_chain(nodes, nodes[p], rest)
    sibs = _tag_kids(nodes, node["parent_pos"])
    i = [n["pos"] for n in sibs].index(node["pos"])
    if comb == "+":
        return i > 0 and _n_chain(nodes, sibs[i - 1], rest)
    if comb == "~":
        return any(_n_chain(nodes, sib, rest) for sib in sibs[:i])
    raise AssertionError(comb)


def _n_rel(nodes, d, comb, scope):
    if comb == " ":
        return any(a["pos"] == scope["pos"] for a in _ancestors(nodes, d))
    if comb == ">":
        return d["parent_pos"] == scope["pos"]
    sibs = _tag_kids(nodes, scope["parent_pos"])
    poss = [n["pos"] for n in sibs]
    if scope["pos"] not in poss or d["pos"] not in poss:
        return False
    i, j = poss.index(scope["pos"]), poss.index(d["pos"])
    return j == i + 1 if comb == "+" else j > i


def _n_chain_scoped(nodes, node, chain, scope):
    comb, simple = chain[-1]
    if not _n_simple(nodes, node, simple):
        return False
    if len(chain) == 1:
        return _n_rel(nodes, node, comb, scope)
    rest = chain[:-1]
    if comb == " ":
        return any(
            _n_chain_scoped(nodes, a, rest, scope)
            for a in _ancestors(nodes, node)
        )
    if comb == ">":
        p = node["parent_pos"]
        return p >= 0 and _n_chain_scoped(nodes, nodes[p], rest, scope)
    sibs = _tag_kids(nodes, node["parent_pos"])
    i = [n["pos"] for n in sibs].index(node["pos"])
    if comb == "+":
        return i > 0 and _n_chain_scoped(nodes, sibs[i - 1], rest, scope)
    return any(_n_chain_scoped(nodes, s, rest, scope) for s in sibs[:i])


def _n_has(nodes, scope, groups):
    return any(
        any(
            _n_chain_scoped(nodes, cand, chain, scope)
            for cand in nodes
            if cand["kind"] == "tag"
        )
        for chain in groups
    )


def naive_select(nodes, selector):
    groups = parse_selector(selector)
    return [
        n["pos"]
        for n in nodes
        if n["kind"] == "tag"
        and any(_n_chain(nodes, n, ch) for ch in groups)
    ]


# ---- strategies --------------------------------------------------------------

TAGS = ["div", "p", "span", "a", "b"]
CLASSES = ["x", "y", "z"]
IDS = ["i1", "i2", "i3"]

_PSEUDOS = [
    "",
    ":first-child",
    ":last-child",
    ":only-child",
    ":only-of-type",
    ":first-of-type",
    ":last-of-type",
    ":nth-child(2)",
    ":nth-child(odd)",
    ":nth-child(2n+1)",
    ":nth-last-child(2)",
    ":nth-last-of-type(1)",
    ":not(.x)",
    ":not(p)",
    ":is(p, .y)",
    ":is(div > span, b)",
    ":where(.z)",
    ":has(span)",
    ":has(> .x)",
    ":has(+ p)",
    ":has(~ b)",
    ":has(a .y)",
]


@st.composite
def docs(draw):
    def build(depth):
        tag = draw(st.sampled_from(TAGS))
        cls = draw(st.lists(st.sampled_from(CLASSES), max_size=2, unique=True))
        idv = draw(st.one_of(st.none(), st.sampled_from(IDS)))
        attrs = ""
        if cls:
            attrs += f' class="{" ".join(cls)}"'
        if idv:
            attrs += f' id="{idv}"'
        n_kids = draw(st.integers(0, 3)) if depth < 3 else 0
        inner = "".join(build(depth + 1) for _ in range(n_kids))
        return f"<{tag}{attrs}>{inner}</{tag}>"

    body = "".join(build(0) for _ in range(draw(st.integers(1, 3))))
    return f"<html><body>{body}</body></html>"


@st.composite
def selectors(draw):
    def compound():
        base = draw(
            st.sampled_from(
                TAGS
                + ["*", ".x", ".y", "#i1", "#i2", "[id]", "[id=i1]", "[id=I2 i]"]
            )
        )
        return base + draw(st.sampled_from(_PSEUDOS))

    n = draw(st.integers(1, 3))
    parts = [compound()]
    for _ in range(n - 1):
        parts.append(draw(st.sampled_from([" ", " > ", " + ", " ~ "])))
        parts.append(compound())
    sel = "".join(parts)
    if draw(st.booleans()):
        sel += ", " + compound()
    return sel


@settings(max_examples=300, deadline=None)
@given(docs(), selectors())
def test_select_matches_naive_evaluator(doc, selector):
    nodes = parse_nodes(doc)
    want = naive_select(nodes, selector)
    got = [n["pos"] for n in select(nodes, selector)]
    assert got == want, (selector, doc)

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

from bisque_spark.functions.css import XML_NS, parse_selector, select
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


def _naive_prefix_uri(nodes, node, prefix):
    """Nearest self-or-ancestor xmlns declaration — an ANCESTOR WALK,
    deliberately different mechanics from the engine's forward pass."""
    cur = node
    while True:
        attrs = cur["attrs"] or {}
        k = "xmlns" if prefix == "" else "xmlns:" + prefix
        if k in attrs:
            return attrs[k]
        p = cur["parent_pos"]
        if p < 0:
            return XML_NS if prefix == "xml" else None
        cur = nodes[p]


def _naive_elem_uri(nodes, node):
    name = node["name"]
    if ":" in name:
        return _naive_prefix_uri(nodes, node, name.partition(":")[0])
    return _naive_prefix_uri(nodes, node, "")


def _naive_doc_ns(nodes):
    out = {"xml": XML_NS}
    for n in nodes:
        if n["kind"] != "tag" or not n["attrs"]:
            continue
        for k, v in n["attrs"].items():
            if k.startswith("xmlns:"):
                out.setdefault(k[6:], v)
    return out


def _n_simple(nodes, node, s, ns_map):
    if node["kind"] != "tag":
        return False
    attrs = node["attrs"] or {}
    if s.tag_ns is not None:
        uri = _naive_elem_uri(nodes, node)
        if s.tag_ns == "*":
            pass
        elif s.tag_ns == "":
            if uri is not None:
                return False
        else:
            want = ns_map.get(s.tag_ns)
            if want is None or uri != want:
                return False
    if s.tag is not None:
        name = node["name"]
        local = name.rpartition(":")[2]
        if s.tag_ns is not None:
            if local != s.tag:
                return False
        elif name != s.tag and not (":" in name and local == s.tag):
            return False
    for i in s.ids:
        if attrs.get("id") != i:
            return False
    if s.classes:
        have = (attrs.get("class") or "").split()
        if not all(c in have for c in s.classes):
            return False
    for name, op, want, flag, ns_p in s.attrs:
        if ns_p is None:
            raws = [attrs[name]] if name in attrs else []
        elif ns_p == "*":
            raws = [
                v for k, v in attrs.items()
                if k == name or (":" in k and k.rpartition(":")[2] == name)
            ]
        else:
            want_uri = ns_map.get(ns_p)
            raws = [] if want_uri is None else [
                v for k, v in attrs.items()
                if ":" in k
                and k.rpartition(":")[2] == name
                and _naive_prefix_uri(nodes, node, k.partition(":")[0])
                == want_uri
            ]
        if not raws:
            return False
        if op is not None and want is not None:
            ok = False
            for raw in raws:
                r, w = (raw.lower(), want.lower()) if flag == "i" else (raw, want)
                if op == "=" and r == w:
                    ok = True
            if not ok:
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
        if _n_simple(nodes, node, neg, ns_map):
            return False
    for groups in s.is_groups:
        if not any(_n_chain(nodes, node, ch, ns_map) for ch in groups):
            return False
    for groups in s.has_groups:
        if not _n_has(nodes, node, groups, ns_map):
            return False
    return True


def _n_chain(nodes, node, chain, ns_map):
    comb, simple = chain[-1]
    if not _n_simple(nodes, node, simple, ns_map):
        return False
    if len(chain) == 1:
        return True
    rest = chain[:-1]
    if comb == " ":
        return any(
            _n_chain(nodes, a, rest, ns_map) for a in _ancestors(nodes, node)
        )
    if comb == ">":
        p = node["parent_pos"]
        return p >= 0 and _n_chain(nodes, nodes[p], rest, ns_map)
    sibs = _tag_kids(nodes, node["parent_pos"])
    i = [n["pos"] for n in sibs].index(node["pos"])
    if comb == "+":
        return i > 0 and _n_chain(nodes, sibs[i - 1], rest, ns_map)
    if comb == "~":
        return any(_n_chain(nodes, sib, rest, ns_map) for sib in sibs[:i])
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


def _n_chain_scoped(nodes, node, chain, scope, ns_map):
    comb, simple = chain[-1]
    if not _n_simple(nodes, node, simple, ns_map):
        return False
    if len(chain) == 1:
        return _n_rel(nodes, node, comb, scope)
    rest = chain[:-1]
    if comb == " ":
        return any(
            _n_chain_scoped(nodes, a, rest, scope, ns_map)
            for a in _ancestors(nodes, node)
        )
    if comb == ">":
        p = node["parent_pos"]
        return p >= 0 and _n_chain_scoped(nodes, nodes[p], rest, scope, ns_map)
    sibs = _tag_kids(nodes, node["parent_pos"])
    i = [n["pos"] for n in sibs].index(node["pos"])
    if comb == "+":
        return i > 0 and _n_chain_scoped(nodes, sibs[i - 1], rest, scope, ns_map)
    return any(
        _n_chain_scoped(nodes, s, rest, scope, ns_map) for s in sibs[:i]
    )


def _n_has(nodes, scope, groups, ns_map):
    return any(
        any(
            _n_chain_scoped(nodes, cand, chain, scope, ns_map)
            for cand in nodes
            if cand["kind"] == "tag"
        )
        for chain in groups
    )


def naive_select(nodes, selector):
    groups = parse_selector(selector)
    ns_map = _naive_doc_ns(nodes)
    return [
        n["pos"]
        for n in nodes
        if n["kind"] == "tag"
        and any(_n_chain(nodes, n, ch, ns_map) for ch in groups)
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


_NS_DECLS = [
    "",
    ' xmlns:n1="u:one"',
    ' xmlns:n2="u:two"',
    ' xmlns:n1="u:two"',  # prefix re-declaration mid-document
    ' xmlns="u:def"',     # default namespace
]
_NS_PREFIXES = [None, None, None, "n1", "n2"]  # mostly unprefixed


@st.composite
def docs(draw):
    def build(depth):
        tag = draw(st.sampled_from(TAGS))
        pfx = draw(st.sampled_from(_NS_PREFIXES))
        qname = f"{pfx}:{tag}" if pfx else tag
        cls = draw(st.lists(st.sampled_from(CLASSES), max_size=2, unique=True))
        idv = draw(st.one_of(st.none(), st.sampled_from(IDS)))
        attrs = draw(st.sampled_from(_NS_DECLS))
        if cls:
            attrs += f' class="{" ".join(cls)}"'
        if idv:
            attrs += f' id="{idv}"'
        if draw(st.integers(0, 4)) == 0:  # occasional prefixed attribute
            apfx = draw(st.sampled_from(["n1", "n2"]))
            attrs += f' {apfx}:data="{draw(st.sampled_from(["v", "w"]))}"'
        n_kids = draw(st.integers(0, 3)) if depth < 3 else 0
        inner = "".join(build(depth + 1) for _ in range(n_kids))
        return f"<{qname}{attrs}>{inner}</{qname}>"

    body = "".join(build(0) for _ in range(draw(st.integers(1, 3))))
    return f"<html><body>{body}</body></html>"


@st.composite
def selectors(draw):
    def compound():
        base = draw(
            st.sampled_from(
                TAGS
                + ["*", ".x", ".y", "#i1", "#i2", "[id]", "[id=i1]", "[id=I2 i]"]
                + [  # namespace forms (prefixes resolve via the doc's
                     # own declarations; n9 is never declared)
                    "n1|div", "n1|*", "n2|p", "*|span", "*|*", "|div",
                    "n9|a", "[n1|data]", "[n2|data=w]", "[*|data]",
                    "[*|data=v]",
                ]
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

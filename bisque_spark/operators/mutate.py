"""Mutation operators re-expressed as node-table rewrites (SURVEY §2.5).

The reference mutates pointer-linked trees in place (insert/extract/
decompose/replace/unwrap/smooth — element/tag_core/page_element.py:
182-450, tag.py:343-422). An immutable node table makes these *row
rewrites*: deletion is an anti-filter on a pos range, replacement swaps
the range for new rows, unwrap drops the tag row and re-parents its
children, smooth is a window run-merge. The containment invariants
(ancestor.pos < d.pos ≤ ancestor.subtree_end for every remaining
descendant) are preserved without renumbering, so the serializer and
all axis operators keep working on the mutated list.

List-level functions serve the per-document path (inside UDFs);
``smooth_nodes_df`` shows the set-oriented form over the whole node
table (the reference's adjacent-string merge, tag.py:385-422, as a
groupBy over window-derived run ids — no per-row Python).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def decompose(nodes: list[dict], pos: int) -> list[dict]:
    """Remove the subtree rooted at ``pos`` (tag.py:343-366)."""
    target = nodes[_index_of(nodes, pos)]
    lo, hi = target["pos"], target["subtree_end"]
    return [n for n in nodes if not (lo <= n["pos"] <= hi)]


def clear(nodes: list[dict], pos: int) -> list[dict]:
    """Remove the CONTENTS of the tag at ``pos``, keeping the tag
    itself (Tag.clear, tag.py:368-383 — extract/decompose every child).
    The emptied tag's subtree_end collapses to its own pos."""
    target = nodes[_index_of(nodes, pos)]
    lo, hi = target["pos"], target["subtree_end"]
    out = []
    for n in nodes:
        if n["pos"] == lo:
            out.append({**n, "subtree_end": lo})
        elif lo < n["pos"] <= hi:
            continue
        else:
            out.append(n)
    return out


def extract_subtree(nodes: list[dict], pos: int) -> tuple[list[dict], list[dict]]:
    """Rip the subtree out; return (remaining, extracted)
    (page_element.py:235-277)."""
    target = nodes[_index_of(nodes, pos)]
    lo, hi = target["pos"], target["subtree_end"]
    remaining, extracted = [], []
    for n in nodes:
        (extracted if lo <= n["pos"] <= hi else remaining).append(n)
    return remaining, extracted


def replace_with_text(nodes: list[dict], pos: int, text: str) -> list[dict]:
    """Replace a subtree with a single string node
    (page_element.py:182-203; string= setter tag.py:287-294)."""
    target = nodes[_index_of(nodes, pos)]
    lo, hi = target["pos"], target["subtree_end"]
    out = []
    for n in nodes:
        if n["pos"] == lo:
            out.append(
                {
                    **target,
                    "kind": "text",
                    "name": None,
                    "attrs": None,
                    "text": text,
                    "subtree_end": lo,
                }
            )
        elif lo < n["pos"] <= hi:
            continue
        else:
            out.append(n)
    return out


def unwrap(nodes: list[dict], pos: int) -> list[dict]:
    """Drop the tag, hoist its children (page_element.py:205-233)."""
    i = _index_of(nodes, pos)
    target = nodes[i]
    parent = target["parent_pos"]
    hi = target["subtree_end"]
    out = []
    for n in nodes:
        if n["pos"] == pos:
            continue
        if n["parent_pos"] == pos:
            n = {**n, "parent_pos": parent, "depth": n["depth"] - 1}
        elif pos < n["pos"] <= hi:
            # the whole hoisted subtree is one level shallower, not
            # just the direct children (ADVICE r01)
            n = {**n, "depth": n["depth"] - 1}
        out.append(n)
    return out


def smooth(nodes: list[dict]) -> list[dict]:
    """Merge adjacent sibling text nodes (tag.py:385-422). Adjacent =
    consecutive children of the same parent, both plain text."""
    out: list[dict] = []
    for n in nodes:
        prev = out[-1] if out else None
        if (
            prev is not None
            and n["kind"] == "text"
            and prev["kind"] == "text"
            and n["parent_pos"] == prev["parent_pos"]
        ):
            out[-1] = {**prev, "text": prev["text"] + n["text"]}
            continue
        out.append(n)
    return out


# ---- structural inserts (rebuild-and-renumber) -------------------------------
#
# insert/append/wrap splice NEW nodes between existing positions. The
# reference repairs four pointer axes in place (page_element.py:
# 296-450); on a flat table the equivalent is: lift to a nested tree,
# splice children lists, flatten back with fresh pos/parent_pos/
# sibling_idx/subtree_end/depth. O(n) per document, done inside the
# same per-document UDF slot as parsing.


def _to_tree(nodes: list[dict]) -> list[dict]:
    roots: list[dict] = []
    by_pos: dict[int, dict] = {}
    for n in nodes:
        copy = {**n, "children": []}
        by_pos[n["pos"]] = copy
        if n["parent_pos"] in by_pos:
            by_pos[n["parent_pos"]]["children"].append(copy)
        else:
            roots.append(copy)
    return roots


def _flatten(roots: list[dict]) -> list[dict]:
    out: list[dict] = []

    def walk(node: dict, parent_pos: int, depth: int, sibling_idx: int) -> int:
        pos = len(out)
        rec = {k: v for k, v in node.items() if k != "children"}
        rec.update(
            pos=pos, parent_pos=parent_pos, depth=depth, sibling_idx=sibling_idx
        )
        out.append(rec)
        for i, child in enumerate(node["children"]):
            walk(child, pos, depth + 1, i)
        rec["subtree_end"] = len(out) - 1
        return pos

    for i, root in enumerate(roots):
        walk(root, -1, 0, i)
    return out


def new_tag(name: str, attrs: dict | None = None) -> dict:
    return {
        "pos": -1,
        "parent_pos": -1,
        "depth": 0,
        "sibling_idx": 0,
        "subtree_end": -1,
        "kind": "tag",
        "name": name,
        "attrs": dict(attrs or {}),
        "text": None,
        "sourceline": None,
        "sourcepos": None,
        "children": [],
    }


def new_string(text: str) -> dict:
    return {
        "pos": -1,
        "parent_pos": -1,
        "depth": 0,
        "sibling_idx": 0,
        "subtree_end": -1,
        "kind": "text",
        "name": None,
        "attrs": None,
        "text": text,
        "sourceline": None,
        "sourcepos": None,
        "children": [],
    }


def _find_in_tree(roots: list[dict], pos: int):
    stack = [(None, i, r) for i, r in enumerate(roots)]
    while stack:
        parent, idx, node = stack.pop()
        if node["pos"] == pos:
            return parent, idx, node
        for i, c in enumerate(node["children"]):
            stack.append((node, i, c))
    raise KeyError(pos)


def insert_node(nodes: list[dict], parent_pos: int, index: int, new: dict) -> list[dict]:
    """``parent.insert(index, new)`` (page_element.py:296-404)."""
    roots = _to_tree(nodes)
    _, _, parent = _find_in_tree(roots, parent_pos)
    parent["children"].insert(index, new)
    return _flatten(roots)


def insert_before(nodes: list[dict], pos: int, new: dict) -> list[dict]:
    roots = _to_tree(nodes)
    parent, idx, _ = _find_in_tree(roots, pos)
    siblings = parent["children"] if parent is not None else roots
    siblings.insert(idx, new)
    return _flatten(roots)


def insert_after(nodes: list[dict], pos: int, new: dict) -> list[dict]:
    roots = _to_tree(nodes)
    parent, idx, _ = _find_in_tree(roots, pos)
    siblings = parent["children"] if parent is not None else roots
    siblings.insert(idx + 1, new)
    return _flatten(roots)


def wrap_node(nodes: list[dict], pos: int, wrapper: dict) -> list[dict]:
    """``el.wrap(tag)`` (page_element.py:205-233)."""
    roots = _to_tree(nodes)
    parent, idx, node = _find_in_tree(roots, pos)
    wrapper = {**wrapper, "children": [node]}
    if parent is not None:
        parent["children"][idx] = wrapper
    else:
        roots[idx] = wrapper
    return _flatten(roots)


def _index_of(nodes: list[dict], pos: int) -> int:
    for i, n in enumerate(nodes):
        if n["pos"] == pos:
            return i
    raise KeyError(pos)


# ---- set-oriented smooth over the whole node table ---------------------------


def smooth_nodes_df(nodes: DataFrame) -> DataFrame:
    """The reference's ``smooth()`` over every document at once.

    Run detection: within (url, parent_pos) ordered by pos, a text row
    starts a new run iff the previous row (in full document order) is
    not a text sibling. run_id = running sum of boundary flags; merge =
    groupBy run concat. Non-text rows pass through. One shuffle.
    """
    w_doc = Window.partitionBy("url", "parent_pos").orderBy("pos")
    prev_kind = F.lag("kind").over(w_doc)
    is_text = F.col("kind") == "text"
    # consecutive rows within (url, parent) in pos order ARE adjacent
    # siblings: anything between two siblings lives inside a sibling
    # subtree, whose root is itself a row in this window and breaks the
    # run unless it's plain text
    boundary = (
        ~is_text | prev_kind.isNull() | (prev_kind != "text")
    ).cast("long")
    runs = nodes.withColumn("run_start", boundary).withColumn(
        "run_id",
        F.sum("run_start").over(
            w_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    texts = (
        runs.where(is_text)
        .groupBy("url", "parent_pos", "run_id")
        .agg(
            F.min("pos").alias("pos"),
            F.min("depth").alias("depth"),
            F.min("sibling_idx").alias("sibling_idx"),
            F.min("pos").alias("subtree_end2"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "text"))),
                    lambda s: s["text"],
                ),
                "",
            ).alias("text"),
        )
        .select(
            "url",
            "pos",
            "parent_pos",
            "depth",
            "sibling_idx",
            F.col("subtree_end2").alias("subtree_end"),
            F.lit("text").alias("kind"),
            F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("map<string,string>").alias("attrs"),
            "text",
            F.lit(None).cast("int").alias("sourceline"),
            F.lit(None).cast("int").alias("sourcepos"),
        )
    )
    others = runs.where(~is_text).drop("run_start", "run_id")
    return others.unionByName(texts)

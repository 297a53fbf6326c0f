"""HTML → flat node-table parser with bisque-equivalent tree semantics.

This is the engine's re-expression of the reference's parse stage
(lmmx/bisque). Where bisque builds a pointer-linked Pydantic tree — one
object per node, four link axes (/root/reference/src/bisque/element/
tag_core/page_element.py:32-80) — this module produces a *flat list of
node records* suitable for an Arrow batch: each node carries
``(pos, parent_pos, depth, sibling_idx, subtree_end, kind, name, attrs,
text, sourceline, sourcepos)``. Document-order position ``pos`` replaces
the ``next_element`` chain; ``subtree_end`` replaces
``_last_descendant`` (the reference's O(1) shortcut at
page_element.py:279-294); ``parent_pos``/``sibling_idx`` replace the
parent/sibling axes. Every bisque traversal axis becomes a range or
window predicate over these columns (SURVEY.md §2.2).

Semantics replicated from the reference (file:line cites → /root/reference):
- whitespace-only text collapse to "\\n" or " " outside pre/textarea
  (src/bisque/main.py:592-628, ASCII_SPACES main.py:104)
- tag-stack pop-to-matching-name with open-tag counter guard
  (src/bisque/main.py:697-729)
- empty-element tags closed immediately; redundant explicit closers
  ignored (src/bisque/builder/_htmlparser/parser.py:63-152)
- numeric charrefs < 256 decoded via document encoding then
  windows-1252 (src/bisque/builder/_htmlparser/parser.py:159-197)
- named entities via the HTML5 table, unknown names kept literal
  (src/bisque/builder/_htmlparser/parser.py:199-216)
- string containers {rt, rp, style, script, template} typing their text
  (src/bisque/builder/core/html_builder.py:113-119, main.py:525-538)
- comments/doctype/CDATA/PI node kinds
  (src/bisque/builder/_htmlparser/parser.py:218-258)
- get_text() = exact-type-filtered descendant string concat
  (src/bisque/element/tag_core/tag.py:296-341, page_element.py:157-180)

The implementation is new code on the stdlib ``html.parser`` (the
reference test suite's default builder, tests/__init__.py:24), written
for batch use: no Pydantic objects, no pointers, one dict per node.
"""

from __future__ import annotations

import re
from html.entities import html5 as _HTML5_ENTITIES
from html.parser import HTMLParser

ASCII_SPACES = "\x20\x0a\x09\x0c\x0d"

# HTML-spec fact tables (public knowledge; also listed at
# /root/reference/src/bisque/builder/core/html_builder.py:28-141).
EMPTY_ELEMENT_TAGS = frozenset(
    """area base br col embed hr img input keygen link menuitem meta param
    source track wbr basefont bgsound command frame image isindex nextid
    spacer""".split()
)
PRESERVE_WHITESPACE_TAGS = frozenset({"pre", "textarea"})
# tag name -> node kind for strings directly inside it
STRING_CONTAINERS = {
    "rt": "rubytext",
    "rp": "rubyparen",
    "style": "stylesheet",
    "script": "script",
    "template": "template",
}
# attributes whose value is a whitespace-separated list
CDATA_LIST_ATTRIBUTES: dict[str, frozenset[str]] = {
    "*": frozenset({"class", "accesskey", "dropzone"}),
    "a": frozenset({"rel", "rev"}),
    "link": frozenset({"rel", "rev"}),
    "td": frozenset({"headers"}),
    "th": frozenset({"headers"}),
    "form": frozenset({"accept-charset"}),
    "object": frozenset({"archive"}),
    "area": frozenset({"rel"}),
    "icon": frozenset({"sizes"}),
    "iframe": frozenset({"sandbox"}),
    "output": frozenset({"for"}),
}

# Node kinds counted as "interesting strings" for get_text on a normal
# tag: NavigableString + CData (tag.py:120-124). A string-container tag
# instead wants exactly its container kind (tag.py:161).
DEFAULT_INTERESTING_KINDS = frozenset({"text", "cdata"})

# HTML5 named-entity map with trailing ';' stripped, first-wins over
# sorted names — the lookup the reference's parser performs
# (substitution.py:30-54 + parser.py:199-216).
_ENTITY_NAME_TO_CHAR: dict[str, str] = {}
for _name in sorted(_HTML5_ENTITIES):
    _key = _name[:-1] if _name.endswith(";") else _name
    _ENTITY_NAME_TO_CHAR.setdefault(_key, _HTML5_ENTITIES[_name])

_NONWHITESPACE_RE = re.compile(r"\S+")

# String node kinds, in the discriminator enumeration used across the
# engine's exploded-node tables.
STRING_KINDS = frozenset(
    {
        "text",
        "cdata",
        "comment",
        "pi",
        "decl",
        "doctype",
        "stylesheet",
        "script",
        "template",
        "rubytext",
        "rubyparen",
    }
)


def split_cdata_list(value: str) -> list[str]:
    """``class="a  b "`` → ``["a", "b"]`` — findall(\\S+) semantics
    (reference: builder/core/main.py:224-259)."""
    return _NONWHITESPACE_RE.findall(value)


def is_cdata_list_attr(tag_name: str, attr_name: str) -> bool:
    if attr_name in CDATA_LIST_ATTRIBUTES["*"]:
        return True
    per_tag = CDATA_LIST_ATTRIBUTES.get(tag_name)
    return per_tag is not None and attr_name in per_tag


class _NodeCollector(HTMLParser):
    """stdlib HTMLParser → flat node records, bisque tag-stack semantics."""

    def __init__(
        self,
        original_encoding: str | None = None,
        on_duplicate_attribute: str = "replace",
    ):
        # convert_charrefs=False: entities are decoded by our handlers
        # with the reference's <256-codepoint compensation.
        super().__init__(convert_charrefs=False)
        self.original_encoding = original_encoding
        self.on_duplicate_attribute = on_duplicate_attribute
        self.nodes: list[dict] = []
        # stack entries: [node_pos, name, child_count] ; root sentinel pos=-1
        self.stack: list[list] = [[-1, "[document]", 0]]
        self.open_counter: dict[str, int] = {}
        self.preserve_ws_depth = 0
        self.container_stack: list[str] = []  # active string-container kinds
        self.current_data: list[str] = []
        self.already_closed_empty: list[str] = []
        self._root_child_count = 0

    # -- data buffering ------------------------------------------------
    def handle_data(self, data):
        self.current_data.append(data)

    def _end_data(self, kind: str | None = None):
        if not self.current_data:
            return
        data = "".join(self.current_data)
        self.current_data = []
        if self.preserve_ws_depth == 0:
            if all(c in ASCII_SPACES for c in data):
                data = "\n" if "\n" in data else " "
        if kind is None:
            kind = "text"
            if self.container_stack:
                kind = self.container_stack[-1]
        self._emit_string(kind, data)

    def _emit_string(self, kind: str, value: str):
        parent = self.stack[-1]
        pos = len(self.nodes)
        line, col = self.getpos()
        self.nodes.append(
            {
                "pos": pos,
                "parent_pos": parent[0],
                "depth": len(self.stack) - 1,
                "sibling_idx": parent[2],
                "subtree_end": pos,
                "kind": kind,
                "name": None,
                "attrs": None,
                "text": value,
                "sourceline": line,
                "sourcepos": col,
            }
        )
        parent[2] += 1

    # -- tags ------------------------------------------------------------
    def handle_starttag(self, name, attrs, handle_empty_element=True):
        self._end_data()
        attr_dict: dict[str, str] = {}
        for key, value in attrs:
            if value is None:
                value = ""
            # duplicate attribute strategies (parser.py:94-106):
            # "replace"/None keeps the last value, "ignore" the first,
            # a callable receives (attr_dict, key, value) and mutates
            if key in attr_dict:
                on_dupe = self.on_duplicate_attribute
                if on_dupe == "ignore":
                    pass
                elif on_dupe in (None, "replace"):
                    attr_dict[key] = value
                else:
                    on_dupe(attr_dict, key, value)
                continue
            attr_dict[key] = value
        parent = self.stack[-1]
        pos = len(self.nodes)
        line, col = self.getpos()
        self.nodes.append(
            {
                "pos": pos,
                "parent_pos": parent[0],
                "depth": len(self.stack) - 1,
                "sibling_idx": parent[2],
                "subtree_end": pos,  # fixed up at pop
                "kind": "tag",
                "name": name,
                "attrs": attr_dict,
                "text": None,
                "sourceline": line,
                "sourcepos": col,
            }
        )
        parent[2] += 1
        self.stack.append([pos, name, 0])
        self.open_counter[name] = self.open_counter.get(name, 0) + 1
        if name in PRESERVE_WHITESPACE_TAGS:
            self.preserve_ws_depth += 1
        if name in STRING_CONTAINERS:
            self.container_stack.append(STRING_CONTAINERS[name])
        if name in EMPTY_ELEMENT_TAGS and handle_empty_element:
            self.handle_endtag(name, check_already_closed=False)
            self.already_closed_empty.append(name)

    def handle_startendtag(self, name, attrs):
        # <tag/> — explicit self-close; suppress the empty-element
        # auto-close so we close exactly once (parser.py:63-76).
        self.handle_starttag(name, attrs, handle_empty_element=False)
        self.handle_endtag(name)

    def _pop_tag(self):
        pos, name, _ = self.stack.pop()
        if name in self.open_counter:
            self.open_counter[name] -= 1
        node = self.nodes[pos]
        node["subtree_end"] = len(self.nodes) - 1
        if name in PRESERVE_WHITESPACE_TAGS and self.preserve_ws_depth > 0:
            self.preserve_ws_depth -= 1
        if name in STRING_CONTAINERS and self.container_stack:
            # pop only if this tag owns the top container entry
            if self.container_stack[-1] == STRING_CONTAINERS[name]:
                self.container_stack.pop()

    def handle_endtag(self, name, check_already_closed=True):
        if check_already_closed and name in self.already_closed_empty:
            self.already_closed_empty.remove(name)
            return
        self._end_data()
        # pop-to-tag with open-counter guard (main.py:697-729)
        if not self.open_counter.get(name):
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if not self.open_counter.get(name):
                break
            top_name = self.stack[-1][1]
            self._pop_tag()
            if top_name == name:
                break

    # -- charrefs ---------------------------------------------------------
    def handle_charref(self, ref):
        if ref.startswith(("x", "X")):
            real = int(ref[1:], 16)
        else:
            real = int(ref)
        data = None
        if real < 256:
            # no break: a later windows-1252 success overwrites an
            # earlier decode, exactly like the reference loop
            # (_htmlparser/parser.py handle_charref)
            for encoding in (self.original_encoding, "windows-1252"):
                if not encoding:
                    continue
                try:
                    data = bytearray([real]).decode(encoding)
                except (UnicodeDecodeError, LookupError):
                    pass
        if not data:
            try:
                data = chr(real)
            except (ValueError, OverflowError):
                data = None
        self.handle_data(data or "\N{REPLACEMENT CHARACTER}")

    def handle_entityref(self, ref):
        char = _ENTITY_NAME_TO_CHAR.get(ref)
        self.handle_data(char if char is not None else f"&{ref}")

    # -- comments / decls / PIs -------------------------------------------
    def handle_comment(self, data):
        self._end_data()
        self.handle_data(data)
        self._end_data("comment")

    def handle_decl(self, data):
        self._end_data()
        self.handle_data(data[len("DOCTYPE ") :])
        self._end_data("doctype")

    def unknown_decl(self, data):
        if data.upper().startswith("CDATA["):
            kind = "cdata"
            data = data[len("CDATA[") :]
        else:
            kind = "decl"
        self._end_data()
        self.handle_data(data)
        self._end_data(kind)

    def handle_pi(self, data):
        self._end_data()
        self.handle_data(data)
        self._end_data("pi")

    # -- driver ------------------------------------------------------------
    def finish(self):
        self._end_data()
        while len(self.stack) > 1:
            self._pop_tag()


def parse_nodes(
    markup: str,
    original_encoding: str | None = None,
    on_duplicate_attribute: str = "replace",
) -> list[dict]:
    """Parse HTML text into a flat, document-ordered node list."""
    collector = _NodeCollector(
        original_encoding=original_encoding,
        on_duplicate_attribute=on_duplicate_attribute,
    )
    try:
        collector.feed(markup)
        collector.close()
    except (AssertionError, Exception) as exc:  # noqa: BLE001
        # mirror the reference's retry-free stdlib path: a rejected
        # document yields whatever was parsed so far (row-level error
        # handling happens in the fetch/extract operators, never a
        # task failure — SURVEY.md §4.2)
        if not isinstance(exc, Exception):
            raise
    collector.finish()
    return collector.nodes


# ---- serialization (the reference's "serialize sink", SURVEY §2.1) ---------
#
# Re-expresses Bisque.decode / Tag.decode with the default "minimal"
# formatter (tag.py:569-661, _format_tag tag.py:727-784, formatter
# registry formatter.py:182-205): sorted attributes, double/single
# quote selection with &quot; escaping (substitution.py:163-198),
# &<> → entities except inside script/style (cdata_containing_tags,
# formatter.py:43,111-133), void elements closed with "/", and the
# per-kind literal wrappers for comments/doctype/CDATA/PI nodes.

_XML_ENTITY_MAP = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}
_AMP_OR_BRACKET = re.compile(r"[<>&]")

# (prefix, suffix) literal wrappers per preformatted string kind
# (tag_core/main.py:99-138)
_STRING_WRAPPERS = {
    "comment": ("<!--", "-->"),
    "cdata": ("<![CDATA[", "]]>"),
    "pi": ("<?", ">"),
    "decl": ("<?", ">"),
    "doctype": ("<!DOCTYPE ", ">\n"),
}
_CDATA_CONTAINING_KINDS = {"script", "stylesheet"}


def substitute_xml(value: str) -> str:
    """&<> → entities (EntitySubstitution.substitute_xml)."""
    return _AMP_OR_BRACKET.sub(lambda m: _XML_ENTITY_MAP[m.group(0)], value)


class _Formatter:
    """Output formatter spec (reference formatter.py:171-205).

    Differences between the registry entries:
    - entity substitution: minimal → &<> only; html/html5 → named
      HTML5 entities (substitution.py:240-254); None → verbatim.
    - void elements: html5 closes as <br> (void_element_close_prefix
      None); the others as <br/>.
    - html5 renders empty-string attributes as boolean attributes
      (empty_attributes_are_booleans, formatter.py:188-192).
    """

    def __init__(self, substitute, void_close_prefix="/", empty_bool=False):
        self.substitute = substitute
        self.void_close_prefix = void_close_prefix
        self.empty_bool = empty_bool


def _formatter_registry() -> dict:
    from bisque_spark.functions.substitution import substitute_html

    return {
        "minimal": _Formatter(substitute_xml),
        "html": _Formatter(substitute_html),
        "html5": _Formatter(
            substitute_html, void_close_prefix="", empty_bool=True
        ),
        None: _Formatter(lambda s: s),
    }


def _resolve_formatter(formatter) -> _Formatter:
    if isinstance(formatter, _Formatter):
        return formatter
    reg = _formatter_registry()
    if formatter in reg:
        return reg[formatter]
    if callable(formatter):
        # callable escape hatch: a custom substitution function, same
        # as passing Formatter(entity_substitution=fn) to the reference
        return _Formatter(formatter)
    raise ValueError(f"unknown formatter: {formatter!r}")


def quoted_attribute_value(value: str) -> str:
    """Quote-style selection per substitution.py:163-198."""
    quote_with = '"'
    if '"' in value:
        if "'" in value:
            value = value.replace('"', "&quot;")
        else:
            quote_with = "'"
    return quote_with + value + quote_with


def _open_tag(node: dict, self_closing: bool, fmt: _Formatter) -> str:
    attrs = node["attrs"] or {}
    parts = [f"<{node['name']}"]
    attr_bits = []
    for key in sorted(attrs):
        val = attrs[key]
        if is_cdata_list_attr(node["name"], key):
            val = " ".join(split_cdata_list(val))
        if fmt.empty_bool and val == "":
            # html5 boolean attribute form: <option selected>
            attr_bits.append(key)
            continue
        text = fmt.substitute(val)
        attr_bits.append(f"{key}={quoted_attribute_value(text)}")
    if attr_bits:
        parts.append(" " + " ".join(attr_bits))
    parts.append(f"{fmt.void_close_prefix}>" if self_closing else ">")
    return "".join(parts)


def serialize_nodes(nodes: list[dict], formatter="minimal") -> str:
    """Flat node list → markup string (bisque ``str(soup)`` parity).

    ``formatter``: "minimal" (default) | "html" | "html5" | None | a
    callable substitution function — the reference's formatter registry
    (formatter.py:171-205)."""
    fmt = _resolve_formatter(formatter)
    pieces: list[str] = []
    open_stack: list[dict] = []  # tag nodes awaiting their END
    for node in nodes:
        while open_stack and open_stack[-1]["subtree_end"] < node["pos"]:
            closed = open_stack.pop()
            pieces.append(f"</{closed['name']}>")
        kind = node["kind"]
        if kind == "tag":
            childless = node["subtree_end"] == node["pos"]
            if childless and node["name"] in EMPTY_ELEMENT_TAGS:
                pieces.append(_open_tag(node, self_closing=True, fmt=fmt))
            elif childless:
                pieces.append(_open_tag(node, self_closing=False, fmt=fmt))
                pieces.append(f"</{node['name']}>")
            else:
                pieces.append(_open_tag(node, self_closing=False, fmt=fmt))
                open_stack.append(node)
        elif kind in _STRING_WRAPPERS:
            prefix, suffix = _STRING_WRAPPERS[kind]
            pieces.append(prefix + node["text"] + suffix)
        elif kind in _CDATA_CONTAINING_KINDS:
            pieces.append(node["text"])  # no substitution inside script/style
        else:  # text / template / rubytext / rubyparen
            pieces.append(fmt.substitute(node["text"]))
    while open_stack:
        pieces.append(f"</{open_stack.pop()['name']}>")
    return "".join(pieces)


# Python-only codec names that are never valid HTML charsets — a meta
# charset being rewritten to one of these is emptied instead
# (reference element/encodings.py:18-36; these are stdlib codec facts)
PYTHON_SPECIFIC_ENCODINGS = frozenset(
    {
        "idna", "mbcs", "oem", "palmos", "punycode", "undefined",
        "raw_unicode_escape", "unicode_escape", "raw-unicode-escape",
        "unicode-escape", "string-escape", "string_escape",
    }
)
_CONTENT_CHARSET_RE = re.compile(r"((^|;)\s*charset=)([^;]*)", re.M)


def _rewrite_meta_charset(nodes: list[dict], encoding: str) -> list[dict]:
    """On output-encode, a <meta charset> (HTML5) or <meta http-equiv=
    content-type content="...charset=..."> (HTML4) declares the NEW
    encoding (reference attributes.py:40-85 + html_builder.py:160-183).
    Python-specific codec names are emptied."""
    out = []
    sub = "" if encoding in PYTHON_SPECIFIC_ENCODINGS else encoding
    for n in nodes:
        if n["kind"] == "tag" and n["name"] == "meta" and n["attrs"]:
            attrs = n["attrs"]
            http_equiv = attrs.get("http-equiv")
            if "charset" in attrs:
                n = {**n, "attrs": {**attrs, "charset": sub}}
            elif (
                "content" in attrs
                and http_equiv is not None
                and http_equiv.lower() == "content-type"
                and _CONTENT_CHARSET_RE.search(attrs["content"])
            ):
                if sub == "":
                    new_content = ""
                else:
                    new_content = _CONTENT_CHARSET_RE.sub(
                        lambda m: m.group(1) + sub, attrs["content"]
                    )
                n = {**n, "attrs": {**attrs, "content": new_content}}
        out.append(n)
    return out


def encode_nodes(
    nodes: list[dict], encoding: str = "utf-8", formatter="minimal"
) -> bytes:
    """``Tag.encode`` (tag.py:539-567): serialize then encode with
    xmlcharrefreplace (characters outside the target charset become
    numeric entities); meta charset declarations are rewritten to the
    target encoding first (attributes.py:40-85)."""
    return serialize_nodes(
        _rewrite_meta_charset(nodes, encoding), formatter=formatter
    ).encode(encoding, "xmlcharrefreplace")


def serialize_contents(nodes: list[dict], root_pos: int, formatter="minimal") -> str:
    """``Tag.decode_contents()`` (tag.py:812-866): children only, no
    enclosing tag markup."""
    root = nodes[root_pos]
    inner = nodes[root_pos + 1 : root["subtree_end"] + 1]
    return serialize_nodes(inner, formatter=formatter)


def prettify_nodes(nodes: list[dict], indent: str = " ", formatter="minimal") -> str:
    """Pretty-printed markup (Tag.decode(indent_level=True) parity,
    tag.py:569-703): one element per line, children indented, text
    stripped (empty → dropped), string-literal mode inside
    whitespace-preserving tags (<pre>/<textarea>) where the subtree is
    emitted inline."""
    fmt = _resolve_formatter(formatter)
    pieces: list[str] = []
    open_stack: list[dict] = []
    level = 0
    literal_tag: dict | None = None

    def emit(piece: str, is_string: bool):
        nonlocal pieces
        if literal_tag is not None:
            pieces.append(piece)
            return
        if is_string:
            piece = piece.strip()
        if not piece:
            return
        pieces.append(indent * level + piece + "\n")

    for node in nodes:
        while open_stack and open_stack[-1]["subtree_end"] < node["pos"]:
            closed = open_stack.pop()
            level -= 1
            if literal_tag is not None and closed["pos"] == literal_tag["pos"]:
                literal_tag = None
                pieces.append(f"</{closed['name']}>\n")
            elif literal_tag is not None:
                pieces.append(f"</{closed['name']}>")
            else:
                pieces.append(indent * level + f"</{closed['name']}>" + "\n")
        kind = node["kind"]
        if kind == "tag":
            childless = node["subtree_end"] == node["pos"]
            if childless and node["name"] in EMPTY_ELEMENT_TAGS:
                emit(_open_tag(node, self_closing=True, fmt=fmt), is_string=False)
            else:
                # childless non-void tags still open/close on separate
                # lines in pretty mode (START + END events)
                if (
                    literal_tag is None
                    and node["name"] in PRESERVE_WHITESPACE_TAGS
                ):
                    # entering string-literal mode: whitespace before,
                    # none after (tag.py:620-635)
                    pieces.append(indent * level + _open_tag(node, False, fmt))
                    literal_tag = node
                else:
                    emit(_open_tag(node, self_closing=False, fmt=fmt), is_string=False)
                open_stack.append(node)
                level += 1
        elif kind in _STRING_WRAPPERS:
            prefix, suffix = _STRING_WRAPPERS[kind]
            emit(prefix + node["text"] + suffix, is_string=True)
        elif kind in _CDATA_CONTAINING_KINDS:
            emit(node["text"], is_string=True)
        else:
            emit(fmt.substitute(node["text"]), is_string=True)
    while open_stack:
        closed = open_stack.pop()
        level -= 1
        if literal_tag is not None and closed["pos"] == literal_tag["pos"]:
            literal_tag = None
            pieces.append(f"</{closed['name']}>\n")
        elif literal_tag is not None:
            pieces.append(f"</{closed['name']}>")
        else:
            pieces.append(indent * level + f"</{closed['name']}>" + "\n")
    return "".join(pieces)


def interesting_kinds_for(tag_name: str | None) -> frozenset[str]:
    """Which string kinds get_text() collects under a given tag."""
    if tag_name in STRING_CONTAINERS:
        return frozenset({STRING_CONTAINERS[tag_name]})
    return DEFAULT_INTERESTING_KINDS


def get_text(
    nodes: list[dict],
    root_pos: int | None = None,
    separator: str = "",
    strip: bool = False,
) -> str:
    """bisque ``Tag.get_text()`` over the flat node list.

    ``root_pos=None`` means the document root (all nodes).
    """
    if root_pos is None:
        lo, hi = -1, len(nodes) - 1
        kinds = DEFAULT_INTERESTING_KINDS
    else:
        root = nodes[root_pos]
        lo, hi = root["pos"], root["subtree_end"]
        kinds = interesting_kinds_for(root["name"])
    parts: list[str] = []
    for node in nodes[lo + 1 : hi + 1]:
        if node["kind"] not in kinds:
            continue
        value = node["text"]
        if strip:
            value = value.strip()
            if not value:
                continue
        parts.append(value)
    return separator.join(parts)


def string_of(nodes: list[dict], pos: int) -> str | None:
    """bisque ``Tag.string`` (tag.py:266-294): the single string child,
    recursing through single-child tags; None if there are zero or
    multiple children."""
    node = nodes[pos]
    while True:
        children = [
            n
            for n in nodes[node["pos"] + 1 : node["subtree_end"] + 1]
            if n["parent_pos"] == node["pos"]
        ]
        if len(children) != 1:
            return None
        child = children[0]
        if child["kind"] in STRING_KINDS:
            return child["text"]
        node = child


def _match_string_value(have: str | None, want) -> bool:
    """SoupStrainer string-value matching: str exact, regex .search,
    True non-None, callable(value) — callables are tried before the
    None short-circuit, exactly like the reference (_matches checks
    Callable before normalizing the markup, soup_strainer.py:214-232)."""
    if want is True:
        return have is not None
    if callable(want) and not isinstance(want, re.Pattern):
        return bool(want(have))
    if have is None:
        return False
    if isinstance(want, re.Pattern):
        return want.search(have) is not None
    return have == want


def find_all(
    nodes: list[dict],
    name: str | None = None,
    attrs: dict | None = None,
    root_pos: int | None = None,
    limit: int | None = None,
    string=None,
) -> list[dict]:
    """Minimal strainer: scan descendants for tags matching name/attrs.

    Attr values match exactly, with multi-valued attributes matching if
    any element (or the whole space-joined string) equals the wanted
    value (soup_strainer.py:214-288). With ``string=`` and a name, the
    tag also requires its single-string child to match (the reference's
    string co-filter, soup_strainer.py:167-173); with ``string=`` alone,
    string nodes are matched instead.
    """
    if string is not None and name is None and not attrs:
        out = []
        lo, hi = (-1, len(nodes) - 1) if root_pos is None else (
            nodes[root_pos]["pos"], nodes[root_pos]["subtree_end"]
        )
        for node in nodes[lo + 1 : hi + 1]:
            if node["kind"] in ("text", "cdata") and _match_string_value(
                node["text"], string
            ):
                out.append(node)
                if limit is not None and len(out) >= limit:
                    break
        return out
    if root_pos is None:
        lo, hi = -1, len(nodes) - 1
    else:
        root = nodes[root_pos]
        lo, hi = root["pos"], root["subtree_end"]
    out = []
    for node in nodes[lo + 1 : hi + 1]:
        if node["kind"] != "tag":
            continue
        if name is not None and name is not True:
            if callable(name) and not isinstance(name, re.Pattern):
                # callable name predicate (soup_strainer.py:139-151);
                # receives the node RECORD (the engine's Tag analogue)
                if not name(node):
                    continue
            elif isinstance(name, re.Pattern):
                if not name.search(node["name"]):
                    continue
            elif node["name"] != name:
                continue
        if attrs:
            ok = True
            for k, want in attrs.items():
                have = (node["attrs"] or {}).get(k)
                if want is True:
                    if have is None:
                        ok = False
                        break
                    continue
                if want is None:
                    if have is not None:
                        ok = False
                        break
                    continue
                if callable(want) and not isinstance(want, re.Pattern):
                    # callable attr predicate — called with the raw
                    # value (None included), per-element for
                    # multi-valued attrs then the joined whole
                    # (soup_strainer.py:214-232)
                    if have is not None and is_cdata_list_attr(
                        node["name"], k
                    ):
                        vals = split_cdata_list(have)
                        if not (
                            any(want(v) for v in vals)
                            or want(" ".join(vals))
                        ):
                            ok = False
                            break
                    elif not want(have):
                        ok = False
                        break
                    continue
                if have is None:
                    ok = False
                    break
                if is_cdata_list_attr(node["name"], k):
                    vals = split_cdata_list(have)
                    if want not in vals and " ".join(vals) != want:
                        ok = False
                        break
                elif have != want:
                    ok = False
                    break
            if not ok:
                continue
        if string is not None and not _match_string_value(
            string_of(nodes, node["pos"]), string
        ):
            continue
        out.append(node)
        if limit is not None and len(out) >= limit:
            break
    return out

"""Named-entity output substitution (HTML formatters' workhorse).

Re-expresses the reference's EntitySubstitution
(/root/reference/src/bisque/dammit/substitution.py:10-254) from the
same public inputs — Python stdlib ``html.entities.html5`` and
``codepoint2name`` — so `substitute_html` picks the same entity names
and matches the same character sequences (parity pinned by a direct
ref-diff in tests/test_serialize.py).

The interesting part is the matching regex: some named entities are
multi-character strings whose first character is itself an entity
(e.g. U+2267 is &GreaterFullEqual; while U+2267 U+0338 is
&NotGreaterFullEqual;), so a single character must only match when NOT
followed by a continuation character (substitution.py:80-112).

Everything here is driver/UDF-side Python; the Spark stage that uses
it is the per-document serialize UDF (parse.serialize_nodes), which
already runs inside an Arrow batch.
"""

from __future__ import annotations

import re
from html.entities import codepoint2name, html5


def _build_tables() -> tuple[dict[str, str], dict[str, str], re.Pattern]:
    char_to_name: dict[str, str] = {}
    name_to_char: dict[str, str] = {}
    singles: set[str] = set()
    multis_by_head: dict[str, set[str]] = {}

    for raw_name, character in sorted(html5.items()):
        name = raw_name[:-1] if raw_name.endswith(";") else raw_name
        name_to_char.setdefault(name, character)
        char_to_name[character] = name
        if len(character) == 1 and ord(character) < 128 and character not in "<>&":
            # single printable-ASCII chars stay literal (| should not
            # become &verbar;) — except <>&, which must be entities
            continue
        if len(character) > 1 and all(ord(c) < 128 for c in character):
            # ASCII sequences like 'fj' stay literal too
            continue
        if len(character) == 1:
            singles.add(character)
        else:
            multis_by_head.setdefault(character[0], set()).add(character)

    particles: set[str] = set()
    for ch in singles:
        longer = multis_by_head.get(ch, set())
        if not longer:
            particles.add(ch)
        else:
            # match the lone char only when not followed by any
            # continuation that would form a longer entity
            cont = "".join(s[1] for s in longer)
            particles.add(f"{ch}(?![{cont}])")
    for seqs in multis_by_head.values():
        particles.update(seqs)

    pattern = re.compile("(%s)" % "|".join(particles))

    # codepoint2name's names win for single chars — they are the
    # classic, more recognizable spellings (eacute over ecaute variants)
    for codepoint, name in codepoint2name.items():
        char_to_name[chr(codepoint)] = name

    return char_to_name, name_to_char, pattern


CHAR_TO_HTML_ENTITY, HTML_ENTITY_TO_CHAR, _HTML_ENTITY_RE = _build_tables()

_AMP_OR_BRACKET = re.compile("([<>&])")
_BARE_AMP_OR_BRACKET = re.compile(r"([<>]|&(?!#\d+;|#x[0-9a-fA-F]+;|\w+;))")
_XML_ENTITIES = {"<": "lt", ">": "gt", "&": "amp", "'": "apos", '"': "quot"}


def substitute_html(value: str) -> str:
    """Replace substitutable Unicode sequences with named entities
    (ref substitution.py:240-254) — é → &eacute; etc."""
    return _HTML_ENTITY_RE.sub(
        lambda m: "&%s;" % CHAR_TO_HTML_ENTITY.get(m.group(0)), value
    )


def substitute_xml(value: str) -> str:
    """&<> → entities (ref substitution.py:201-219)."""
    return _AMP_OR_BRACKET.sub(lambda m: "&%s;" % _XML_ENTITIES[m.group(0)], value)


def substitute_xml_containing_entities(value: str) -> str:
    """Like substitute_xml, but ampersands already part of an entity
    definition are left alone (ref substitution.py:221-238)."""
    return _BARE_AMP_OR_BRACKET.sub(
        lambda m: "&%s;" % _XML_ENTITIES[m.group(0)], value
    )

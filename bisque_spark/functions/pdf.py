"""PDF text extraction — pure stdlib/zlib, no external libs.

Real crawls meet PDFs as often as images; this module gives the text
pipeline (operators/text.py gates, dedup, token stats) a decoder for
them, with the same per-row honesty contract as the image codecs:
supported layouts extract, everything else raises and the caller
routes the row to an error column.

Covered (the dominant born-digital layouts, per the public PDF 1.7 /
ISO 32000-1 spec):
- classic cross-reference tables AND xref streams (/Type/XRef with
  /W field widths, /Prev chains), object streams (/Type/ObjStm —
  where modern writers put almost every object),
- FlateDecode (zlib) content streams incl. /Contents arrays,
- the page tree with inherited /Resources,
- text operators BT/ET, Tj, ', ", TJ (kerning arrays), with Td/TD/
  T*/Tm line tracking → newline emission,
- literal strings (escapes, octal, balanced parens), hex strings,
- simple-font bytes via /ToUnicode CMaps (bfchar + bfrange, incl.
  array destinations) or WinAnsi/Standard fallback, and 2-byte
  Identity-H Type0 fonts with ToUnicode.

Out of scope (honest errors): encrypted files, LZW/DCT-coded content
streams, Type3 glyph procedures, fonts with neither ToUnicode nor a
standard encoding. Scanned-image PDFs extract as empty text (true:
they contain none).

The reference engine (lmmx/bisque) parses HTML only; this is
engine-side surface for the crawl's documents sink (SURVEY §2.6-era
relational categories consume the extracted text).
"""

from __future__ import annotations

import re
import zlib

# cap on any single FlateDecode output (hostile zlib bombs reach
# ~1000:1; the executor process, not the row, dies on an unbounded
# inflate)
_MAX_INFLATE = 64 * 1024 * 1024

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Minimal PDF object lexer/parser over a bytes buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def skip_ws(self):
        d = self.data
        while self.pos < len(d):
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                nl = d.find(b"\n", self.pos)
                self.pos = len(d) if nl < 0 else nl + 1
            else:
                return

    def _token(self) -> bytes:
        d = self.data
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        return d[start : self.pos]

    def parse(self):
        """One object at the current position."""
        self.skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise ValueError("unexpected end of PDF data")
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            return self._dict()
        if c == 0x3C:  # '<' hex string
            return self._hex_string()
        if c == 0x28:  # '(' literal string
            return self._lit_string()
        if c == 0x2F:  # '/' name
            self.pos += 1
            return Name(self._name_bytes())
        if c == 0x5B:  # '['
            self.pos += 1
            arr = []
            while True:
                self.skip_ws()
                if self.pos < len(d) and d[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.parse())
        if c in b"+-.0123456789":
            return self._number_or_ref()
        tok = self._token()
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        raise ValueError(f"bad PDF token {tok[:20]!r}")

    def _name_bytes(self) -> bytes:
        d = self.data
        start = self.pos
        out = bytearray()
        while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            if d[self.pos] == 0x23 and self.pos + 2 < len(d):  # '#xx'
                out += bytes([int(d[self.pos + 1 : self.pos + 3], 16)])
                self.pos += 3
            else:
                out.append(d[self.pos])
                self.pos += 1
        return bytes(out)

    def _dict(self):
        self.pos += 2
        out = {}
        d = self.data
        while True:
            self.skip_ws()
            if d.startswith(b">>", self.pos):
                self.pos += 2
                return out
            if d[self.pos] != 0x2F:
                raise ValueError("dict key must be a name")
            self.pos += 1
            key = self._name_bytes()
            out[key.decode("latin-1")] = self.parse()

    def _hex_string(self) -> bytes:
        d = self.data
        end = d.find(b">", self.pos + 1)
        if end < 0:
            raise ValueError("unterminated hex string")
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", d[self.pos + 1 : end])
        if len(hx) % 2:
            hx += b"0"
        self.pos = end + 1
        return bytes.fromhex(hx.decode("ascii"))

    def _lit_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= len(d):
                    break
                e = d[self.pos]
                mapped = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
                if e in mapped:
                    out.append(mapped[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"01234567":  # octal, up to 3 digits
                    oct_s = bytearray()
                    while (
                        len(oct_s) < 3
                        and self.pos < len(d)
                        and d[self.pos] in b"01234567"
                    ):
                        oct_s.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_s, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < len(d) and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise ValueError("unterminated literal string")

    def _number_or_ref(self):
        d = self.data
        save = self.pos
        tok = self._token()
        try:
            if b"." in tok:
                return float(tok)
            num = int(tok)
        except ValueError as exc:
            raise ValueError(f"bad number {tok[:20]!r}") from exc
        # lookahead: "<gen> R" → indirect reference
        save2 = self.pos
        self.skip_ws()
        tok2_start = self.pos
        tok2 = self._token()
        if tok2.isdigit():
            self.skip_ws()
            tok3 = self._token()
            if tok3 == b"R":
                return Ref(num, int(tok2))
        self.pos = save2
        return num


class Name(str):
    """PDF name object (distinct from strings)."""

    __slots__ = ()

    def __new__(cls, raw: bytes):
        return super().__new__(cls, raw.decode("latin-1"))


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):
        return f"Ref({self.num},{self.gen})"


# ---- document model -----------------------------------------------------------


class PdfDocument:
    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF header)")
        self.data = data
        # offsets[num] = byte offset | ('objstm', container_num, idx)
        self.offsets: dict[int, object] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._load_xref()
        if "Encrypt" in self.trailer:
            raise NotImplementedError("encrypted PDF")

    # -- xref ------------------------------------------------------------

    def _load_xref(self):
        d = self.data
        at = d.rfind(b"startxref")
        if at < 0:
            raise ValueError("missing startxref")
        lx = _Lexer(d, at + len(b"startxref"))
        lx.skip_ws()
        start = lx._token()
        seen = set()
        pos = int(start)
        while pos not in seen:
            seen.add(pos)
            if not (0 <= pos < len(d)):
                raise ValueError("xref offset out of range")
            lx = _Lexer(d, pos)
            lx.skip_ws()
            if d.startswith(b"xref", lx.pos):
                trailer = self._load_xref_table(lx.pos + 4)
            else:
                trailer = self._load_xref_stream(pos)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            nxt = trailer.get("Prev")
            if nxt is None:
                return
            pos = int(nxt)

    def _load_xref_table(self, pos: int) -> dict:
        d = self.data
        lx = _Lexer(d, pos)
        while True:
            lx.skip_ws()
            if d.startswith(b"trailer", lx.pos):
                lx.pos += len(b"trailer")
                return lx.parse()
            first = int(lx._token())
            lx.skip_ws()
            count = int(lx._token())
            lx.skip_ws()
            for i in range(count):
                entry = d[lx.pos : lx.pos + 20]
                off = int(entry[0:10])
                kind = entry[17:18]
                num = first + i
                if kind == b"n" and num not in self.offsets:
                    self.offsets[num] = off
                lx.pos += 20
                # tolerate 19-byte lines (single-char EOL writers)
                while lx.pos < len(d) and d[lx.pos] in b"\r\n ":
                    lx.pos += 1

    def _load_xref_stream(self, pos: int) -> dict:
        num, stream_dict, body = self._parse_object_at(pos)
        if stream_dict.get("Type") != "XRef":
            raise ValueError("expected xref stream")
        w = [int(x) for x in stream_dict["W"]]
        size = int(stream_dict["Size"])
        index = stream_dict.get("Index", [0, size])
        index = [int(x) for x in index]
        row = sum(w)
        pos2 = 0
        it = iter(range(0, len(index), 2))
        for i in it:
            first, count = index[i], index[i + 1]
            for k in range(count):
                rec = body[pos2 : pos2 + row]
                pos2 += row
                if len(rec) < row:
                    raise ValueError("short xref stream")
                fields = []
                o = 0
                for width in w:
                    fields.append(
                        int.from_bytes(rec[o : o + width], "big") if width else 1
                    )
                    o += width
                objnum = first + k
                if objnum in self.offsets:
                    continue
                if fields[0] == 1:
                    self.offsets[objnum] = fields[1]
                elif fields[0] == 2:
                    self.offsets[objnum] = ("objstm", fields[1], fields[2])
        return stream_dict

    # -- objects ----------------------------------------------------------

    def resolve(self, obj):
        # bounded: a hostile `1 0 obj 2 0 R` <-> `2 0 obj 1 0 R` (or
        # self-ref) chain would otherwise spin forever — get_object
        # caches the Ref object itself, so the isinstance loop never
        # terminates (ADVICE r7 #1). A legitimate chain can't be longer
        # than the number of objects in the file.
        hops = 0
        limit = len(self.offsets) + 1
        while isinstance(obj, Ref):
            hops += 1
            if hops > limit:
                raise ValueError("cyclic indirect reference chain")
            obj = self.get_object(obj.num)
        return obj

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        loc = self.offsets.get(num)
        if loc is None:
            return None
        if isinstance(loc, tuple):
            _, container, idx = loc
            objs = self._load_objstm(container)
            obj = objs[idx] if idx < len(objs) else None
        else:
            _, d, body = self._parse_object_at(loc)
            obj = (d, body) if body is not None else d
        self._cache[num] = obj
        return obj

    def _parse_object_at(self, pos: int):
        """→ (num, object, stream_body|None) for 'N G obj ... endobj'."""
        d = self.data
        lx = _Lexer(d, pos)
        lx.skip_ws()
        num = int(lx._token())
        lx.skip_ws()
        lx._token()  # gen
        lx.skip_ws()
        if lx._token() != b"obj":
            raise ValueError("expected 'obj'")
        obj = lx.parse()
        lx.skip_ws()
        if d.startswith(b"stream", lx.pos):
            lx.pos += len(b"stream")
            if d[lx.pos : lx.pos + 2] == b"\r\n":
                lx.pos += 2
            elif d[lx.pos : lx.pos + 1] in (b"\n", b"\r"):
                lx.pos += 1
            length = self.resolve(obj.get("Length"))
            body = d[lx.pos : lx.pos + int(length)]
            return num, obj, self._decode_stream(obj, body)
        return num, obj, None

    def _decode_stream(self, sdict: dict, body: bytes) -> bytes:
        filt = self.resolve(sdict.get("Filter"))
        if filt is None:
            return body
        filters = filt if isinstance(filt, list) else [filt]
        for f in filters:
            f = self.resolve(f)
            if f == "FlateDecode":
                # bounded inflate: a kilobyte-scale hostile stream at
                # ~1000:1 can inflate to GBs and OOM-kill the executor
                # process — outside per-row try/except containment
                # (ADVICE r7 #3). 64 MB is far beyond any legitimate
                # content stream this reader handles.
                dec = zlib.decompressobj()
                body = dec.decompress(body, _MAX_INFLATE)
                if dec.unconsumed_tail:
                    raise ValueError("FlateDecode output exceeds 64 MB cap")
                parms = self.resolve(sdict.get("DecodeParms")) or {}
                if isinstance(parms, list):
                    parms = self.resolve(parms[0]) or {}
                pred = int(self.resolve(parms.get("Predictor", 1)) or 1)
                if pred >= 10:  # PNG predictors (xref streams use Up)
                    cols = int(self.resolve(parms.get("Columns", 1)))
                    body = _png_unpredict(body, cols)
                elif pred != 1:
                    raise NotImplementedError(f"predictor {pred}")
            elif f == "ASCIIHexDecode":
                hx = re.sub(rb"[^0-9A-Fa-f]", b"", body.split(b">")[0])
                if len(hx) % 2:
                    hx += b"0"
                body = bytes.fromhex(hx.decode("ascii"))
            else:
                raise NotImplementedError(f"stream filter {f}")
        return body

    def _load_objstm(self, num: int) -> list:
        if num in self._objstm_cache:
            return self._objstm_cache[num]
        got = self.get_object(num)
        if not (isinstance(got, tuple) and len(got) == 2):
            raise ValueError("object stream missing body")
        sdict, body = got
        n = int(self.resolve(sdict["N"]))
        first = int(self.resolve(sdict["First"]))
        lx = _Lexer(body, 0)
        offs = []
        for _ in range(n):
            lx.skip_ws()
            lx._token()  # object number (sequential map)
            lx.skip_ws()
            offs.append(int(lx._token()))
        objs = []
        for off in offs:
            objs.append(_Lexer(body, first + off).parse())
        self._objstm_cache[num] = objs
        return objs

    # -- pages -------------------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise ValueError("missing document catalog")
        out: list[dict] = []

        def walk(node_ref, inherited_res):
            node = self.resolve(node_ref)
            if isinstance(node, tuple):
                node = node[0]
            if not isinstance(node, dict):
                return
            res = node.get("Resources", inherited_res)
            if node.get("Type") == "Pages" or "Kids" in node:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, res)
            else:
                page = dict(node)
                page["Resources"] = res
                out.append(page)

        walk(root.get("Pages"), None)
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        parts = contents if isinstance(contents, list) else [contents]
        out = []
        for p in parts:
            p = self.resolve(p)
            if isinstance(p, tuple) and len(p) == 2:
                out.append(p[1])
        return b"\n".join(out)


def _png_unpredict(data: bytes, cols: int) -> bytes:
    row = cols
    out = bytearray()
    prev = bytes(row)
    pos = 0
    while pos + 1 + row <= len(data) + row:  # tolerate short last row
        ft = data[pos]
        cur = bytearray(data[pos + 1 : pos + 1 + row])
        if len(cur) < row:
            break
        if ft == 2:  # Up — what xref-stream writers use
            for i in range(row):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ft == 0:
            pass
        elif ft == 1:
            for i in range(1, row):
                cur[i] = (cur[i] + cur[i - 1]) & 0xFF
        else:
            raise NotImplementedError(f"png predictor row type {ft}")
        out += cur
        prev = bytes(cur)
        pos += 1 + row
    return bytes(out)


# ---- fonts / encodings ---------------------------------------------------------

# WinAnsiEncoding differences from latin-1 in 0x80-0x9F (PDF annex D)
_WINANSI = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…", 0x86: "†",
    0x87: "‡", 0x88: "ˆ", 0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“", 0x94: "”", 0x95: "•",
    0x96: "–", 0x97: "—", 0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}


def _parse_tounicode(cmap: bytes) -> dict[int, str]:
    """ToUnicode CMap → {code: text} (bfchar + bfrange, incl. array
    destinations). Codespace width is taken from the key length."""
    out: dict[int, str] = {}

    def u16be_text(b: bytes) -> str:
        if len(b) % 2:
            b += b"\x00"
        return b.decode("utf-16-be", "replace")

    for m in re.finditer(
        rb"beginbfchar(.*?)endbfchar", cmap, re.S
    ):
        toks = re.findall(rb"<([0-9A-Fa-f]+)>", m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            out[int(src, 16)] = u16be_text(bytes.fromhex(dst.decode()))
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        body = m.group(1)
        lx = _Lexer(body, 0)
        while True:
            lx.skip_ws()
            if lx.pos >= len(body):
                break
            try:
                lo = lx.parse()
                hi = lx.parse()
                dst = lx.parse()
            except Exception:
                break
            lo_i = int.from_bytes(lo, "big")
            hi_i = int.from_bytes(hi, "big")
            if isinstance(dst, list):
                for k, d in enumerate(dst):
                    out[lo_i + k] = u16be_text(d)
            else:
                base = int.from_bytes(dst, "big")
                width = len(dst)
                for k in range(hi_i - lo_i + 1):
                    out[lo_i + k] = u16be_text(
                        (base + k).to_bytes(max(width, 2), "big")
                    )
    return out


class _Font:
    def __init__(self, doc: PdfDocument, fdict: dict):
        fdict = doc.resolve(fdict)
        if isinstance(fdict, tuple):
            fdict = fdict[0]
        self.two_byte = doc.resolve(fdict.get("Subtype")) == "Type0"
        self.cmap = None
        tu = doc.resolve(fdict.get("ToUnicode"))
        if isinstance(tu, tuple) and len(tu) == 2:
            self.cmap = _parse_tounicode(tu[1])
        enc = doc.resolve(fdict.get("Encoding"))
        self.winansi = enc == "WinAnsiEncoding"
        if self.two_byte and self.cmap is None and enc not in (
            "Identity-H", "Identity-V",
        ):
            raise NotImplementedError("Type0 font without ToUnicode")

    def decode(self, raw: bytes) -> str:
        if self.two_byte:
            codes = [
                int.from_bytes(raw[i : i + 2], "big")
                for i in range(0, len(raw) - len(raw) % 2, 2)
            ]
        else:
            codes = list(raw)
        out = []
        for c in codes:
            if self.cmap is not None and c in self.cmap:
                out.append(self.cmap[c])
            elif self.two_byte:
                out.append(chr(c))  # Identity fallback
            elif self.winansi and c in _WINANSI:
                out.append(_WINANSI[c])
            else:
                out.append(bytes([c]).decode("latin-1"))
        return "".join(out)


# ---- text extraction ------------------------------------------------------------


def _page_text(doc: PdfDocument, page: dict) -> str:
    content = doc.page_content(page)
    res = doc.resolve(page.get("Resources")) or {}
    if isinstance(res, tuple):
        res = res[0]
    fonts_dict = doc.resolve(res.get("Font")) or {}
    fonts: dict[str, _Font] = {}
    lx = _Lexer(content, 0)
    stack: list = []
    cur_font: _Font | None = None
    pieces: list[str] = []
    ty = None  # current line y (Tm/Td tracking → newline emission)

    def emit(raw: bytes):
        if not isinstance(raw, (bytes, bytearray)):
            return
        f = cur_font or _DEFAULT_FONT
        pieces.append(f.decode(bytes(raw)))

    def newline():
        if pieces and not (pieces and pieces[-1].endswith("\n")):
            pieces.append("\n")

    while True:
        lx.skip_ws()
        if lx.pos >= len(content):
            break
        c = content[lx.pos]
        if c in b"+-.0123456789" or c in b"(<[/":
            try:
                stack.append(lx.parse())
            except ValueError:
                lx.pos += 1
            continue
        op = lx._token()
        if not op:
            lx.pos += 1
            continue
        if op == b"Tj" or op == b"'":
            if op == b"'":
                newline()
            if stack:
                emit(stack[-1])
        elif op == b'"':
            newline()
            if stack:
                emit(stack[-1])
        elif op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, (bytes, bytearray)):
                        emit(el)
                    elif isinstance(el, (int, float)) and el < -180:
                        # large negative kern ≈ inter-word space
                        pieces.append(" ")
        elif op == b"Tf":
            if len(stack) >= 2 and isinstance(stack[-2], Name):
                name = str(stack[-2])
                if name not in fonts:
                    fd = doc.resolve(fonts_dict.get(name))
                    try:
                        fonts[name] = (
                            _Font(doc, fd) if fd is not None else _DEFAULT_FONT
                        )
                    except NotImplementedError:
                        fonts[name] = _DEFAULT_FONT
                cur_font = fonts[name]
        elif op in (b"Td", b"TD"):
            if len(stack) >= 1 and isinstance(stack[-1], (int, float)):
                if stack[-1] != 0:
                    newline()
        elif op == b"T*":
            newline()
        elif op == b"Tm":
            if len(stack) >= 1 and isinstance(stack[-1], (int, float)):
                y = stack[-1]
                if ty is not None and y != ty:
                    newline()
                ty = y
        elif op == b"BT":
            ty = None
        elif op == b"ET":
            newline()
        elif op in (b"BI",):
            # inline image: skip to EI
            at = content.find(b"EI", lx.pos)
            lx.pos = len(content) if at < 0 else at + 2
        stack = stack if op in (b"",) else []
    text = "".join(pieces)
    text = re.sub(r"\n{2,}", "\n", text)
    return text.strip("\n")


class _DefaultFont:
    two_byte = False

    def decode(self, raw: bytes) -> str:
        return raw.decode("latin-1")


_DEFAULT_FONT = _DefaultFont()


def pdf_text(data: bytes) -> dict:
    """PDF bytes → {"text": str, "n_pages": int}.

    Unsupported layouts raise (NotImplementedError for honest
    unsupported features, ValueError for damage) — callers route both
    to the error column."""
    doc = PdfDocument(bytes(data))
    pages = doc.pages()
    texts = [_page_text(doc, p) for p in pages]
    return {"text": "\n".join(t for t in texts).strip("\n"),
            "n_pages": len(pages)}


# ---- writer (synth/test rows) ----------------------------------------------------


def encode_pdf(
    pages: list[str],
    *,
    compress: bool = True,
    use_tj_arrays: bool = False,
    xref_stream: bool = False,
    unicode_font: bool = False,
) -> bytes:
    """Page texts → conforming PDF bytes. Layout knobs exercise
    distinct reader paths: Flate page streams, TJ kerning arrays,
    xref streams + object streams (the modern-writer layout), and a
    2-byte Identity-H font with a ToUnicode CMap for non-latin text."""

    objects: dict[int, bytes] = {}
    streams: dict[int, bytes] = {}

    rev_winansi = {ch: code for code, ch in _WINANSI.items()}

    def esc(s: str) -> bytes:
        b = bytes(
            rev_winansi.get(ch, ord(ch) if ord(ch) < 256 else 0x3F)
            for ch in s
        )
        return (
            b.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
        )

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Count {n_pages} /Kids [ {kids} ] >>".encode()
    )
    for i, text in enumerate(pages):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        objects[pnum] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {cnum} 0 R "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
        ).encode()
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for li, line in enumerate(text.split("\n")):
            if li:
                ops.append(b"0 -14 Td")
            if unicode_font:
                enc = line.encode("utf-16-be").hex().upper().encode()
                ops.append(b"<" + enc + b"> Tj")
            elif use_tj_arrays and " " in line:
                words = line.split(" ")
                arr = b" ".join(
                    b"(" + esc(w_) + b") -280" for w_ in words[:-1]
                ) + b" (" + esc(words[-1]) + b")"
                ops.append(b"[ " + arr + b" ] TJ")
            else:
                ops.append(b"(" + esc(line) + b") Tj")
        ops.append(b"ET")
        streams[cnum] = b"\n".join(ops)
    if unicode_font:
        tu_num = font_num + 1
        # Identity-H Type0 font whose ToUnicode maps code==codepoint
        objects[font_num] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            f"/Encoding /Identity-H /ToUnicode {tu_num} 0 R >>"
        ).encode()
        streams[tu_num] = (
            b"/CIDInit /ProcSet findresource begin\n"
            b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
            b"endcodespacerange\n1 beginbfrange\n<0000> <FFFF> <0000>\n"
            b"endbfrange\nendcmap\nend"
        )
        objects[tu_num] = b""  # replaced below (stream dict built inline)
    else:
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>"
        )

    def serialize_stream(num: int, body: bytes, extra: bytes = b"") -> bytes:
        if compress:
            comp = zlib.compress(body, 6)
            head = (
                b"<< /Length " + str(len(comp)).encode()
                + b" /Filter /FlateDecode " + extra + b">>"
            )
            return head + b"\nstream\n" + comp + b"\nendstream"
        head = b"<< /Length " + str(len(body)).encode() + b" " + extra + b">>"
        return head + b"\nstream\n" + body + b"\nendstream"

    out = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    all_nums = sorted(set(objects) | set(streams))

    if not xref_stream:
        for num in all_nums:
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode()
            if num in streams:
                out += serialize_stream(num, streams[num])
            else:
                out += objects[num]
            out += b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {all_nums[-1] + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, all_nums[-1] + 1):
            out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
        out += (
            b"trailer\n<< /Size " + str(all_nums[-1] + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF"
        )
        return bytes(out)

    # modern layout: non-stream objects ride an ObjStm; xref is a stream
    objstm_num = all_nums[-1] + 1
    xref_num = objstm_num + 1
    plain = [n for n in all_nums if n not in streams]
    inner = bytearray()
    header = bytearray()
    inner_offs = []
    for n in plain:
        inner_offs.append((n, len(inner)))
        inner += objects[n] + b"\n"
    for n, off in inner_offs:
        header += f"{n} {off} ".encode()
    objstm_body = bytes(header) + bytes(inner)
    first = len(header)
    # stream objects written top-level
    for num in all_nums:
        if num in streams:
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode()
            out += serialize_stream(num, streams[num])
            out += b"\nendobj\n"
    offsets[objstm_num] = len(out)
    out += f"{objstm_num} 0 obj\n".encode()
    out += serialize_stream(
        objstm_num, objstm_body,
        extra=f"/Type /ObjStm /N {len(plain)} /First {first} ".encode(),
    )
    out += b"\nendobj\n"
    xref_at = len(out)
    size = xref_num + 1
    rows = bytearray()
    rows += bytes([0, 0, 0, 255, 255])  # object 0: free
    for num in range(1, size):
        if num == xref_num:
            rows += bytes([1]) + xref_at.to_bytes(3, "big") + bytes([0])
        elif num in offsets:
            rows += bytes([1]) + offsets[num].to_bytes(3, "big") + bytes([0])
        else:
            idx = plain.index(num)
            rows += bytes([2]) + objstm_num.to_bytes(3, "big") + bytes([idx])
    xbody = zlib.compress(bytes(rows), 6)
    out += f"{xref_num} 0 obj\n".encode()
    out += (
        b"<< /Type /XRef /Size " + str(size).encode()
        + b" /W [1 3 1] /Root 1 0 R /Filter /FlateDecode /Length "
        + str(len(xbody)).encode() + b" >>\nstream\n" + xbody
        + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(xref_at).encode() + b"\n%%EOF"
    return bytes(out)

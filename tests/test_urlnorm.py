"""URL canonicalization: unit vectors + hypothesis properties."""

from hypothesis import given, settings
from hypothesis import strategies as st

from bisque_spark.functions.urlnorm import canonicalize_url

VECTORS = [
    ("HTTP://EXAMPLE.COM/Path", "http://example.com/Path"),
    ("http://example.com:80/", "http://example.com/"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com/a/b/../../../c", "http://example.com/c"),
    ("http://example.com/x#frag", "http://example.com/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/%7euser", "http://example.com/~user"),
    ("http://example.com/%7Euser", "http://example.com/~user"),
    ("http://example.com/a%2Fb", "http://example.com/a%2Fb"),
    ("http://example.com/?q=%7e", "http://example.com/?q=~"),
    ("ftp://example.com/x", None),
    ("mailto:a@b.c", None),
    ("", None),
    ("http://", None),
    ("  http://example.com/x  ", "http://example.com/x"),
    # illegal raw chars are percent-encoded (java.net.URI-legal output)
    ("http://example.com/a b", "http://example.com/a%20b"),
    ("http://example.com/a|b<c>", "http://example.com/a%7Cb%3Cc%3E"),
    ("http://example.com/café", "http://example.com/caf%C3%A9"),
    ("http://example.com/100%off", "http://example.com/100%25off"),
    ("http://example.com/?q=a b&r={x}", "http://example.com/?q=a%20b&r=%7Bx%7D"),
    ('http://example.com/"quoted"', "http://example.com/%22quoted%22"),
    # hosts that are not a valid reg-name are rejected
    ("http://ex ample.com/x", None),
    ("http://[::1]/x", None),
]


def test_vectors():
    for raw, want in VECTORS:
        assert canonicalize_url(raw) == want, raw


def test_relative_resolution():
    base = "http://h.test/a/b.html"
    assert canonicalize_url("c.html", base=base) == "http://h.test/a/c.html"
    assert canonicalize_url("/c.html", base=base) == "http://h.test/c.html"
    assert canonicalize_url("../c.html", base=base) == "http://h.test/c.html"
    assert canonicalize_url("//other.test/x", base=base) == "http://other.test/x"
    assert canonicalize_url("#frag", base=base) == "http://h.test/a/b.html"


_url_st = st.builds(
    lambda host, path, port, frag, upper: (
        ("HTTP://" if upper else "http://")
        + host
        + (f":{port}" if port else "")
        + path
        + (f"#{frag}" if frag else "")
    ),
    host=st.from_regex(r"[a-z]{1,8}(\.[a-z]{2,4}){1,2}", fullmatch=True),
    path=st.from_regex(r"(/[a-zA-Z0-9._~%-]{0,6}){0,4}", fullmatch=True),
    port=st.sampled_from([None, 80, 8080]),
    frag=st.sampled_from([None, "x", "top"]),
    upper=st.booleans(),
)


@settings(max_examples=200, deadline=None)
@given(_url_st)
def test_idempotent(url):
    once = canonicalize_url(url)
    if once is not None:
        assert canonicalize_url(once) == once


# raw hrefs scraped off the real web carry spaces, quotes, braces,
# non-ASCII, stray '%' — chars java.net.URI rejects. Canonical output
# must encode them all (ADVICE r5: parse_url NULLing broke the
# engine-vs-twin trap-guard contract for such URLs).
_NASTY_SEG = st.text(
    alphabet='ab2 %"<>{}|\\^`é€?', min_size=0, max_size=6
)
_nasty_url_st = st.builds(
    lambda host, segs, q: "http://" + host + "/" + "/".join(segs)
    + (("?" + q) if q else ""),
    host=st.sampled_from(["h0.example", "h1.example"]),
    segs=st.lists(_NASTY_SEG, min_size=0, max_size=4),
    q=_NASTY_SEG,
)

_URI_LEGAL = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-._~!$&'()*+,;=:@/?%"
)


@settings(max_examples=200, deadline=None)
@given(_nasty_url_st)
def test_nasty_chars_encoded_and_idempotent(url):
    c = canonicalize_url(url)
    if c is None:
        return
    # every output char is legal in a java.net.URI path/query, and
    # every '%' begins a valid hex triple — parse_url cannot NULL
    assert all(ch in _URI_LEGAL for ch in c), c
    import re

    for m in re.finditer("%", c):
        assert re.match(r"%[0-9A-F]{2}", c[m.start():]), c
    assert canonicalize_url(c) == c


@settings(max_examples=100, deadline=None)
@given(_url_st)
def test_canonical_is_http_with_host_and_path(url):
    c = canonicalize_url(url)
    if c is not None:
        assert c.startswith("http://") or c.startswith("https://")
        assert "#" not in c
        from urllib.parse import urlsplit

        parts = urlsplit(c)
        assert parts.hostname == parts.hostname.lower()
        assert parts.path.startswith("/")

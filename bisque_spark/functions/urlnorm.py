"""RFC 3986 URL canonicalization + hashing — the frontier's key space.

Mandated by BASELINE.json north_star: "URLs are RFC-3986-canonicalized
and xxhash64-hashed in vectorized Arrow UDFs". The reference has no URL
handling beyond a resembles-a-URL warning
(/root/reference/src/bisque/main.py:392-420); this module is new engine
surface.

Rules applied (RFC 3986 §6.2.2-6.2.3):
- scheme and host lowercased
- default port stripped (http:80, https:443)
- dot-segments removed from the path
- percent-encoding: unreserved characters decoded, hex digits
  uppercased, reserved left encoded
- characters ILLEGAL in their component (raw space, ``"<>{}|\\^`` …,
  non-ASCII, stray ``%``) are percent-encoded, so every canonical URL
  is java.net.URI-parseable — downstream JVM ``F.parse_url`` (the trap
  guard, host extraction) never NULLs out on a canonical URL and the
  Column forms stay bit-identical to their Python twins
- hosts that are not a valid RFC 3986 reg-name (raw space etc.; also
  bracketed IPv6 literals) are rejected → None — not schedulable
- fragment dropped
- empty path → "/"
- query preserved verbatim except percent-hex + illegal-char encoding

``canonicalize_url`` is a pure function applied over pandas Series
inside an Arrow batch (pandas UDF) — one regex-free pass per URL, no
urllib.parse object churn in the inner percent loop.

Spark-side hashing uses the JVM built-in ``F.xxhash64``; the Python
twin (bisque_spark.hashing) is parity-pinned by tests so the
single-process oracle computes identical url_hash values.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = "0123456789ABCDEFabcdef"
_SUB_DELIMS = set("!$&'()*+,;=")
# RFC 3986: path = *( pchar / "/" ), pchar = unreserved / pct / sub-delims
# / ":" / "@"; query additionally allows "/" and "?" (both sets below
# keep "/" since we encode the already-split component, not segments)
_PATH_SAFE = _UNRESERVED | _SUB_DELIMS | set(":@/")
_QUERY_SAFE = _PATH_SAFE | {"?"}
# reg-name = *( unreserved / pct-encoded / sub-delims ); hostnames are
# already lowercased, and a '%' in a host is vanishingly rare — reject
# rather than guess (also rejects bracketless IPv6 from urlsplit)
_HOST_SAFE = _UNRESERVED | _SUB_DELIMS


def _norm_percent(s: str, safe: frozenset | set = _PATH_SAFE) -> str:
    """One pass: uppercase valid %XX hex (decoding unreserved),
    percent-encode stray '%' and any char outside ``safe`` (UTF-8
    bytes) — output contains only chars java.net.URI accepts in the
    component."""
    if "%" not in s and all(c in safe for c in s):
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            if i + 2 < n and s[i + 1] in _HEX and s[i + 2] in _HEX:
                code = int(s[i + 1 : i + 3], 16)
                ch = chr(code)
                if ch in _UNRESERVED:
                    out.append(ch)
                else:
                    out.append("%" + s[i + 1 : i + 3].upper())
                i += 3
            else:  # stray '%' — illegal everywhere; encode it
                out.append("%25")
                i += 1
        elif c in safe:
            out.append(c)
            i += 1
        else:  # illegal in this component (space, '<', non-ASCII, …)
            out.extend("%%%02X" % b for b in c.encode("utf-8"))
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    if not path:
        return path
    output: list[str] = []
    segments = path.split("/")
    absolute = path.startswith("/")
    n = len(segments)
    for idx, seg in enumerate(segments):
        last = idx == n - 1
        if seg == ".":
            if last:
                output.append("")
        elif seg == "..":
            if output and output[-1] != "":
                output.pop()
                if not output and absolute:
                    output.append("")
            if last:
                output.append("")
        else:
            output.append(seg)
    joined = "/".join(output)
    if absolute and not joined.startswith("/"):
        joined = "/" + joined
    return joined


def canonicalize_url(url: str, base: str | None = None) -> str | None:
    """Canonical form of ``url`` (resolved against ``base`` if given).

    Returns None for non-http(s) or unparseable URLs — the frontier
    only schedules http(s).
    """
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    if base:
        try:
            url = urljoin(base, url)
        except ValueError:
            return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host or any(c not in _HOST_SAFE for c in host):
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = _remove_dot_segments(_norm_percent(parts.path, _PATH_SAFE)) or "/"
    query = _norm_percent(parts.query, _QUERY_SAFE)
    return urlunsplit((scheme, netloc, path, query, ""))


def url_host(url: str) -> str | None:
    try:
        return urlsplit(url).hostname
    except ValueError:
        return None


# ---- Spark column-level wrappers -------------------------------------------


def _canonicalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize_url(u) if u is not None else None)


def canonicalize_url_udf(col):
    """Arrow-batched canonicalizer (UDF built lazily — module-level
    pandas_udf objects don't survive pickling to executors)."""
    return F.pandas_udf(_canonicalize_series, StringType())(col)


def with_canonical(df, url_col: str = "url", out_col: str = "url"):
    """df + canonicalized URL column (Arrow-batched)."""
    return df.withColumn(out_col, canonicalize_url_udf(F.col(url_col)))


def url_hash_col(url_col: str = "url") -> Column:
    """JVM-side xxhash64 of the canonical URL (no Python)."""
    return F.xxhash64(F.col(url_col))


def host_col(url_col: str = "url") -> Column:
    """Host extraction stays JVM-side via parse_url."""
    return F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))

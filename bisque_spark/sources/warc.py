"""WARC archival source/sink (ISO 28500 / WARC 1.1, the public Web
ARChive spec used by Common Crawl, Heritrix and the Internet Archive).

The crawl's fetch results become standard WARC response records so the
corpus interoperates with the rest of the crawl ecosystem, and foreign
WARC dumps can be ingested straight into the extract pipeline.

Spark-native shape: a "WARC file" here is a BINARY COLUMN value — one
per-partition stream of per-record gzip members (the spec's
recommended compression layout, §D.2: each record its own gzip member,
so a stream is seekable record-by-record and `zcat` of the
concatenation is a valid uncompressed WARC). Stored in parquet, the
blob column rides the engine's normal partitioning/catalog machinery;
exporting real ``.warc.gz`` files is a driver-side byte copy of each
row. At 100 TB the archive is written by the same executors that
fetched, one blob per partition — no driver funnel, no small-file
storm.

Determinism (crawl.py contract — no clocks, no randomness):
``WARC-Date`` derives from the crawl epoch against a fixed base date,
and ``WARC-Record-ID`` is a urn:uuid formed from xxhash64 of
(url, date) — re-running the crawl re-creates byte-identical archives.

Record layout follows the spec: version line, CRLF named fields,
``Content-Type: application/http; msgtype=response`` with a minimal
HTTP/1.1 status head as the block prefix, ``WARC-Payload-Digest`` as
``sha1:`` + base32 (the conventional form), two CRLFs after the block.
Each segment leads with a ``warcinfo`` record; readers skip non-response
records, so foreign files with request/metadata records ingest cleanly.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from bisque_spark.hashing import xxh64

WARC_VERSION = "WARC/1.1"
BASE_DATE = "2026-01-01T00:00:{ss:02d}Z"  # epoch → deterministic second

_REASONS = {
    200: "OK",
    404: "Not Found",
    429: "Too Many Requests",
    503: "Service Unavailable",
}


def warc_date_for_epoch(epoch: int) -> str:
    """Deterministic WARC-Date for a crawl epoch (no wall clock)."""
    return BASE_DATE.format(ss=epoch % 60)


def _record_id(url: str, date: str) -> str:
    a = xxh64(f"warcid:{url}:{date}".encode())
    b = xxh64(f"warcid2:{url}:{date}".encode())
    hx = f"{a:016x}{b:016x}"
    return (
        f"urn:uuid:{hx[0:8]}-{hx[8:12]}-{hx[12:16]}-{hx[16:20]}-{hx[20:32]}"
    )


def payload_digest(payload: bytes) -> str:
    return "sha1:" + base64.b32encode(
        hashlib.sha1(payload).digest()
    ).decode("ascii")


def build_response_record(
    url: str, status: int, payload: bytes, date: str
) -> bytes:
    """One WARC response record (uncompressed bytes)."""
    reason = _REASONS.get(status, "Status")
    http_head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii")
    block = http_head + payload
    headers = [
        (WARC_VERSION, None),
        ("WARC-Type", "response"),
        ("WARC-Record-ID", f"<{_record_id(url, date)}>"),
        ("WARC-Date", date),
        ("WARC-Target-URI", url),
        ("WARC-Payload-Digest", payload_digest(payload)),
        ("Content-Type", "application/http; msgtype=response"),
        ("Content-Length", str(len(block))),
    ]
    head = "".join(
        f"{k}\r\n" if v is None else f"{k}: {v}\r\n" for k, v in headers
    ).encode("ascii")
    return head + b"\r\n" + block + b"\r\n\r\n"


def build_warcinfo_record(
    date: str, n_records: int, segment_key: str = ""
) -> bytes:
    """``segment_key`` (the segment's first URL, deterministic under
    shuffle reorder) is mixed into the record-id seed so each
    partition's warcinfo gets a globally-unique WARC-Record-ID as ISO
    28500 requires — a shared per-epoch id would collide across the
    epoch's segments."""
    block = (
        "software: bisque_spark\r\n"
        "format: WARC File Format 1.1\r\n"
        f"records: {n_records}\r\n"
    ).encode("ascii")
    rid = _record_id(f"warcinfo:{segment_key}:{n_records}", date)
    headers = [
        (WARC_VERSION, None),
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", f"<{rid}>"),
        ("WARC-Date", date),
        ("Content-Type", "application/warc-fields"),
        ("Content-Length", str(len(block))),
    ]
    head = "".join(
        f"{k}\r\n" if v is None else f"{k}: {v}\r\n" for k, v in headers
    ).encode("ascii")
    return head + b"\r\n" + block + b"\r\n\r\n"


def parse_warc(data: bytes) -> list[dict]:
    """Concatenated WARC records (plain or per-record gzip members) →
    [{headers: dict, block: bytes}]. Raises ValueError on structural
    damage (truncated block, missing CRLFs, bad version line) — the
    honest-error contract; digest mismatches raise too."""
    if data[:2] == b"\x1f\x8b":
        out = b""
        pos = 0
        while pos < len(data):
            d = gzip.zlib.decompressobj(16 + gzip.zlib.MAX_WBITS)
            out += d.decompress(data[pos:])
            rest = d.unused_data
            if not rest:
                break
            pos = len(data) - len(rest)
        data = out
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC version line at offset {pos}")
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        lines = data[pos:head_end].decode("utf-8").split("\r\n")
        headers: dict[str, str] = {"__version__": lines[0]}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError("missing/invalid Content-Length")
        block_start = head_end + 4
        block_end = block_start + length
        if data[block_end : block_end + 4] != b"\r\n\r\n":
            raise ValueError("record block not CRLF-CRLF terminated")
        block = data[block_start:block_end]
        dig = headers.get("WARC-Payload-Digest")
        if dig is not None and headers.get("WARC-Type") == "response":
            payload = _response_payload(block)
            if payload_digest(payload) != dig:
                raise ValueError(
                    f"payload digest mismatch for "
                    f"{headers.get('WARC-Target-URI')}"
                )
        records.append({"headers": headers, "block": block})
        pos = block_end + 4
    return records


def _response_payload(block: bytes) -> bytes:
    sep = block.find(b"\r\n\r\n")
    return block[sep + 4 :] if sep >= 0 else block


def _response_status(block: bytes) -> int:
    try:
        return int(block.split(b"\r\n", 1)[0].split(b" ")[1])
    except (IndexError, ValueError):
        return -1


# ---- Spark stages ----------------------------------------------------------


def warc_segments(
    fetched: DataFrame,
    epoch: int,
    url_col: str = "url",
    status_col: str = "status",
    content_col: str = "content",
    compress: bool = True,
) -> DataFrame:
    """fetch rows → one WARC stream per partition:
    (segment binary, n_records, first_url). Rows are archived in
    (url) order within the partition so the segment bytes are a pure
    function of the partition's row SET (determinism under shuffle
    reorder). NULL content archives as an empty payload with the real
    status (the 404/429 trace is part of the crawl record)."""
    date = warc_date_for_epoch(epoch)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for _, r in pdf.iterrows():
                content = r[content_col]
                rows.append(
                    (
                        str(r[url_col]),
                        int(r[status_col]),
                        bytes(content) if content is not None else b"",
                    )
                )
        if not rows:
            return
        rows.sort(key=lambda t: t[0])
        recs = [build_warcinfo_record(date, len(rows), rows[0][0])] + [
            build_response_record(u, s, c, date) for (u, s, c) in rows
        ]
        if compress:
            seg = b"".join(
                gzip.compress(r, compresslevel=6, mtime=0) for r in recs
            )
        else:
            seg = b"".join(recs)
        yield pd.DataFrame(
            {
                "segment": [seg],
                "n_records": [len(rows)],
                "first_url": [rows[0][0]],
            }
        )

    return fetched.select(url_col, status_col, content_col).mapInPandas(
        run, schema="segment binary, n_records int, first_url string"
    )


def read_warc(segments: DataFrame, segment_col: str = "segment") -> DataFrame:
    """WARC blobs → (url, status, content, warc_date) fetch rows —
    response records only (warcinfo/request/metadata skipped), so
    foreign archives ingest into the same extract pipeline as live
    fetches. Structurally damaged segments raise (honest error), they
    do not silently drop rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "status": [], "content": [], "warc_date": []}
            for blob in pdf[segment_col]:
                for rec in parse_warc(bytes(blob)):
                    if rec["headers"].get("WARC-Type") != "response":
                        continue
                    out["url"].append(rec["headers"].get("WARC-Target-URI"))
                    out["status"].append(_response_status(rec["block"]))
                    out["content"].append(_response_payload(rec["block"]))
                    out["warc_date"].append(rec["headers"].get("WARC-Date"))
            if out["url"]:
                yield pd.DataFrame(out)

    return segments.select(segment_col).mapInPandas(
        run,
        schema="url string, status int, content binary, warc_date string",
    )

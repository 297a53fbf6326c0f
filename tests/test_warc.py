"""WARC source/sink (sources/warc.py): round-trip, determinism under
row reorder, per-record gzip members, digest verification, foreign
record skipping, structural honesty."""

import gzip

import pytest

from bisque_spark.sources.warc import (
    build_response_record,
    build_warcinfo_record,
    parse_warc,
    payload_digest,
    read_warc,
    warc_date_for_epoch,
    warc_segments,
)
from bisque_spark.synth import World, page_bytes, page_url

WORLD = World(n_hosts=6, n_seeds=8)


def _fetch_rows(n_hosts=4, pages=5):
    rows = []
    for i in range(n_hosts):
        for p in range(pages):
            url = page_url(WORLD, i, p)
            status, content = page_bytes(WORLD, url)
            rows.append((url, status, content))
    return rows


@pytest.mark.parametrize("compress", [True, False])
def test_warc_roundtrip(spark, compress):
    rows = _fetch_rows()
    df = spark.createDataFrame(rows, "url string, status int, content binary")
    seg = warc_segments(df, epoch=2, compress=compress)
    back = read_warc(seg).collect()
    got = {
        (r["url"], r["status"], bytes(r["content"]) if r["content"] else b"")
        for r in back
    }
    # NULL content archives as empty payload with the real status
    want = {(u, s, c if c is not None else b"") for (u, s, c) in rows}
    assert got == want
    assert all(r["warc_date"] == warc_date_for_epoch(2) for r in back)


def test_warc_segment_deterministic_under_reorder(spark):
    rows = _fetch_rows()
    df1 = spark.createDataFrame(rows, "url string, status int, content binary")
    df2 = spark.createDataFrame(
        list(reversed(rows)), "url string, status int, content binary"
    )
    s1 = warc_segments(df1.coalesce(1), epoch=0).collect()
    s2 = warc_segments(df2.coalesce(1), epoch=0).collect()
    assert len(s1) == len(s2) == 1
    assert bytes(s1[0]["segment"]) == bytes(s2[0]["segment"])
    assert s1[0]["n_records"] == len(rows)


def test_gzip_members_equal_plain():
    rows = _fetch_rows(2, 3)
    date = warc_date_for_epoch(1)
    recs = [build_warcinfo_record(date, len(rows))] + [
        build_response_record(u, s, c or b"", date) for (u, s, c) in rows
    ]
    plain = b"".join(recs)
    members = b"".join(gzip.compress(r, mtime=0) for r in recs)
    assert parse_warc(members) == parse_warc(plain)
    # spec §D.2: the concatenation of members decompresses to the
    # plain stream (zcat equivalence)
    assert gzip.decompress(members) == plain


def test_parse_skips_nothing_but_reader_filters_types(spark):
    date = warc_date_for_epoch(3)
    url = page_url(WORLD, 0, 1)
    _, content = page_bytes(WORLD, url)
    resp = build_response_record(url, 200, content, date)
    info = build_warcinfo_record(date, 1)
    recs = parse_warc(info + resp)
    assert [r["headers"]["WARC-Type"] for r in recs] == [
        "warcinfo",
        "response",
    ]
    df = spark.createDataFrame([(info + resp,)], "segment binary")
    out = read_warc(df).collect()
    assert len(out) == 1 and out[0]["url"] == url


def test_warcinfo_record_ids_unique_across_segments(spark):
    # ISO 28500 §5.2: WARC-Record-ID is globally unique — each
    # partition's warcinfo must get its own id (segment_key mixed into
    # the seed), not one shared per-epoch id (ADVICE r5)
    rows = _fetch_rows(4, 3)
    df = spark.createDataFrame(rows, "url string, status int, content binary")
    segs = warc_segments(df.repartition(4, "url"), epoch=1).collect()
    assert len(segs) > 1
    ids = []
    for s in segs:
        recs = parse_warc(bytes(s["segment"]))
        ids.extend(
            r["headers"]["WARC-Record-ID"]
            for r in recs
            if r["headers"]["WARC-Type"] == "warcinfo"
        )
    assert len(ids) == len(segs)
    assert len(set(ids)) == len(ids)


def test_structural_damage_raises():
    date = warc_date_for_epoch(0)
    rec = build_response_record("http://h.test/", 200, b"abc", date)
    with pytest.raises(ValueError):
        parse_warc(rec[:-6])  # truncated terminator
    with pytest.raises(ValueError):
        parse_warc(b"NOTWARC" + rec)
    # tamper with one payload byte → digest mismatch must raise
    tampered = rec.replace(b"abc", b"abd")
    with pytest.raises(ValueError):
        parse_warc(tampered)
    assert payload_digest(b"abc") != payload_digest(b"abd")

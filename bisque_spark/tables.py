"""Canonical table schemas (FIXTURES.md / BASELINE.json input_hint).

One place for every engine table's DDL so catalog creation, streaming
sources, tests, and documentation agree. The `images` schema is the
exact input_hint shape.
"""

IMAGES = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

SEEDS = "url string, rank int"

PAGES = "url string, status int, content binary, fetched_at timestamp"

ROBOTS = "host string, crawl_delay double, disallow array<string>"

FRONTIER = (
    "url string, url_hash long, host string, depth int, priority double, "
    "crawl_delay double"
)

URL_SEEN_SHARDS = "bucket int, bloom binary"

SEEN_EXACT = "url_hash long"

ORDER_LOG = (
    "epoch int, host string, host_rank int, priority double, "
    "url_hash long, url string"
)

LINEAGE = (
    "epoch int, rows_scheduled long, rows_fetched long, rows_failed long, "
    "bloom_version int"
)

NODES = (
    "url string, pos int, parent_pos int, depth int, sibling_idx int, "
    "subtree_end int, kind string, name string, attrs map<string,string>, "
    "text string, sourceline int, sourcepos int"
)

AUDIO = "media_id string, bytes binary, fmt string, sample_rate int"

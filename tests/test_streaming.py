"""Streaming ingest (SURVEY §2.1 S9-S11): checkpointed exactly-once
upsert/delete stream → delta log → live search → compaction.

Mirrors the reference's subscriber semantics
(``internal/subscriber/subscriber.go:78-95``): upsert = delete + re-add,
last-write-wins, arrival order; plus our documented Lucene-style live
statistics between compactions.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from searchengine_spark.query.bm25 import search_direct
from searchengine_spark.streaming import StreamingIndex

ROOT = "/tmp/seng_stream_test"
SRC = os.path.join(ROOT, "incoming")


def _msg(seq, conv_id, turn_idx, text, role="user", tool="", ts="2025-02-01T00:00:00",
         delete=False):
    return {
        "seq": seq,
        "doc_id": f"{conv_id}:{turn_idx:04d}",
        "delete": delete,
        "doc": {
            "conv_id": conv_id, "turn_idx": turn_idx, "role": role,
            "text": text, "tool": tool, "ts": ts,
        },
    }


def _write_batch(name: str, msgs: list[dict]) -> None:
    os.makedirs(SRC, exist_ok=True)
    tmp = os.path.join(SRC, f".{name}.tmp")
    with open(tmp, "w") as f:
        for m in msgs:
            f.write(json.dumps(m) + "\n")
    os.replace(tmp, os.path.join(SRC, name))


@pytest.fixture(scope="module")
def sidx(spark, transcripts):
    shutil.rmtree(ROOT, ignore_errors=True)
    s = StreamingIndex(spark, os.path.join(ROOT, "store"))
    s.bootstrap(transcripts)
    yield s
    shutil.rmtree(ROOT, ignore_errors=True)


def test_bootstrap_matches_corpus(sidx, transcripts):
    assert sidx.current_docs().count() == transcripts.count()
    assert sidx.catalog.current() is not None


def test_ingest_upsert_delete(sidx, spark, transcripts):
    n0 = transcripts.count()
    # victim: an existing doc to update, another to delete
    first = transcripts.orderBy("conv_id", "turn_idx").limit(2).collect()
    upd, dele = first[0], first[1]
    _write_batch("b1.json", [
        _msg(1, "zstream", 0, "freshly streamed spark document zebrafresh"),
        _msg(2, "zstream", 1, "another streamed turn zebrafresh zebrafresh"),
        _msg(3, upd["conv_id"], upd["turn_idx"], "updated text zebrafresh only"),
        _msg(4, dele["conv_id"], dele["turn_idx"], "", delete=True),
        # last-write-wins within the batch: seq 6 beats seq 5
        _msg(5, "zstream", 2, "loser version"),
        _msg(6, "zstream", 2, "winner version zebrafresh"),
    ])
    sidx.ingest_files(SRC)

    cur = sidx.current_docs().cache()
    # +3 new docs, 1 update (net 0), 1 delete (net -1)
    assert cur.count() == n0 + 3 - 1
    upd_row = cur.where(
        (F.col("conv_id") == upd["conv_id"]) & (F.col("turn_idx") == upd["turn_idx"])
    ).collect()
    assert len(upd_row) == 1 and "zebrafresh" in upd_row[0]["text"]
    assert cur.where(
        (F.col("conv_id") == dele["conv_id"]) & (F.col("turn_idx") == dele["turn_idx"])
    ).count() == 0
    win = cur.where((F.col("conv_id") == "zstream") & (F.col("turn_idx") == 2)).collect()
    assert len(win) == 1 and win[0]["text"].startswith("winner")
    cur.unpersist()


def test_checkpoint_makes_ingest_idempotent(sidx):
    deltas_before = sidx.delta_ids()
    sidx.ingest_files(SRC)  # no new files → no new deltas
    assert sidx.delta_ids() == deltas_before


def test_live_search_sees_stream(sidx):
    hits = sidx.search(["zebrafresh"]).collect()
    ids = [r["doc_id"] for r in hits]
    assert "zstream:0000" in ids and "zstream:0001" in ids and "zstream:0002" in ids
    # doc with tf=2 ranks above tf=1 (same dl ballpark): top hit is turn 1
    assert hits[0]["doc_id"] == "zstream:0001"


def test_live_search_excludes_tombstones(sidx, transcripts):
    dele = transcripts.orderBy("conv_id", "turn_idx").limit(2).collect()[1]
    dead_id = f"{dele['conv_id']}:{dele['turn_idx']:04d}"
    # search a heavy term from the deleted doc's text — the dead doc must
    # never surface even if it would match
    from searchengine_spark.oracle import tokenize

    terms = list(dict.fromkeys(tokenize(dele["text"])))[:3]
    if terms:
        ids = [r["doc_id"] for r in sidx.search(terms, k=1000).collect()]
        assert dead_id not in ids


def test_live_stats_semantics(sidx):
    """Single-term live score follows the documented maxDoc-style stats:
    N and df include tombstoned-but-unmerged docs."""
    import math

    from searchengine_spark import semantics as S

    base = sidx.catalog.current()
    n_docs = base.stats["n_docs"]
    sum_dl = base.stats["sum_dl"]
    for did in sidx.delta_ids():
        m = sidx._delta_meta(did)
        n_docs += m["n_docs"]
        sum_dl += m["sum_dl"]
    avgdl = sum_dl / n_docs
    # 'zebrafresh' exists only in the 4 delta docs (one superseded by the
    # update? no — it's in upd's new text too) → df = 4
    df = 4
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    # top hit zstream:0001: tf=2, dl=5 ("another streamed turn zebrafresh zebrafresh")
    tf, dl = 2.0, 5.0
    expected = idf * S.tf_norm(tf, dl, avgdl)
    got = sidx.search(["zebrafresh"]).collect()[0]["score"]
    assert abs(got - round(expected, S.SCORE_DECIMALS)) <= 10 ** -S.SCORE_DECIMALS


def test_compact_restores_exactness(sidx, spark):
    sidx.compact()
    assert sidx.delta_ids() == []
    cur = sidx.current_docs()
    live = sidx.search(["zebrafresh"]).collect()
    direct = search_direct(cur, ["zebrafresh"]).collect()
    assert [(r["doc_id"], r["score"]) for r in live] == [
        (r["doc_id"], r["score"]) for r in direct
    ]
    # post-compaction the indexed path agrees too (rank-identical gate)
    from searchengine_spark.index.engine import open_index, search_index

    ix = open_index(spark, sidx.catalog)
    idx_hits = search_index(ix, ["zebrafresh"]).collect()
    assert [(r["doc_id"], r["score"]) for r in idx_hits] == [
        (r["doc_id"], r["score"]) for r in direct
    ]


def test_post_compact_multiterm_rank_identity(sidx, spark):
    cur = sidx.current_docs()
    from searchengine_spark.index.engine import open_index, search_index

    ix = open_index(spark, sidx.catalog)
    for terms in (["spark", "query", "plan"], ["data", "model"]):
        direct = search_direct(cur, terms).collect()
        viaidx = search_index(ix, terms).collect()
        assert [(r["doc_id"], r["score"]) for r in viaidx] == [
            (r["doc_id"], r["score"]) for r in direct
        ]


def test_second_stream_after_compact(sidx):
    _write_batch("b2.json", [
        _msg(10, "zstream", 3, "postcompact arrival zebrafresh"),
    ])
    sidx.ingest_files(SRC)
    ids = [r["doc_id"] for r in sidx.search(["zebrafresh"]).collect()]
    assert "zstream:0003" in ids


def test_parse_messages_kafka_shape(spark):
    """The Kafka value-bytes → typed message transform (S9/S10) on a
    static frame (the streaming plan uses the identical expression)."""
    from searchengine_spark.streaming.ingest import parse_messages

    m = _msg(7, "kx", 0, "kafka carried text")
    raw = spark.createDataFrame([(json.dumps(m).encode("utf-8"),)], "value BINARY")
    row = parse_messages(raw).collect()[0]
    assert row["seq"] == 7 and row["doc_id"] == "kx:0000" and not row["delete"]
    assert row["doc"]["text"] == "kafka carried text" and row["doc"]["turn_idx"] == 0


def test_events_hourly_rollup_stream_equals_batch(spark):
    """The availableNow streaming window agg over the staged events
    fixture equals the batch hour-truncate groupBy (S9 on driver data)."""
    from pyspark.sql import functions as F

    from searchengine_spark import semantics as S
    from searchengine_spark.streaming.events import events_hourly_rollup

    sf_dir = "/root/testdata/sf0.01"
    got = [tuple(r) for r in events_hourly_rollup(spark, sf_dir).collect()]
    batch = [
        tuple(r)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("window_start_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), S.SCORE_DECIMALS).alias("sum_value"),
        )
        .orderBy("window_start_us", "event_type")
        .collect()
    ]
    assert len(got) > 10 and got == batch


def test_nats_source_raises_without_connector(spark):
    import pytest as _pytest

    from searchengine_spark.streaming.events import nats_source

    with _pytest.raises(RuntimeError, match="NATS"):
        nats_source(spark, "nats://localhost:4222", "documents")


def test_socket_source_live_push(spark):
    """The live-broker edge, integration-tested in-sandbox: an embedded
    TCP server pushes newline-delimited JSON messages (the NATS
    core-subject shape — reference ``internal/subscriber/
    subscriber.go:38-76``) into a running Structured Streaming query
    via ``socket_source``; the typed rows land in arrival order."""
    import socket
    import threading
    import time

    from searchengine_spark.streaming.ingest import socket_source

    msgs = [
        _msg(1, "sock", 0, "pushed over the wire"),
        _msg(2, "sock", 1, "second live message"),
        _msg(3, "sock", 0, "", delete=True),
    ]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("".join(json.dumps(m) + "\n" for m in msgs)).encode())
            stop.wait(timeout=30)  # keep the connection open until the query drains

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    q = (
        socket_source(spark, "127.0.0.1", port)
        .writeStream.format("memory")
        .queryName("socket_live")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("socket_live").count() < len(msgs):
            time.sleep(0.5)
        rows = spark.table("socket_live").orderBy("seq").collect()
    finally:
        stop.set()
        q.stop()
        srv.close()
    assert [r["seq"] for r in rows] == [1, 2, 3]
    assert rows[0]["doc_id"] == "sock:0000" and not rows[0]["delete"]
    assert rows[0]["doc"]["text"] == "pushed over the wire"
    assert rows[2]["delete"] and rows[2]["doc_id"] == "sock:0000"


def test_kafka_shaped_stream_end_to_end(spark, transcripts):
    """S10 production wiring, executed (not just parsed): frames with
    Kafka's exact column shape (binary key/value + topic/partition/
    offset/timestamp metadata) flow through ``parse_messages`` →
    ``ingest_stream`` → ``apply_batch``, with checkpoint/resume across
    drains. Only the ``.format("kafka")`` load itself is swapped for a
    text-file stand-in carrying identical binary payloads (no broker in
    the sandbox — ``kafka_source`` wires the real load)."""
    import time

    from searchengine_spark.streaming.ingest import parse_messages

    root = "/tmp/seng_kafka_shaped"
    kdir = os.path.join(root, "topic")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(kdir)

    def write_topic_file(name, msgs):
        tmp = os.path.join(kdir, f".{name}.tmp")
        with open(tmp, "w") as f:
            for m in msgs:
                f.write(json.dumps(m) + "\n")
        os.replace(tmp, os.path.join(kdir, name))

    def kafka_shaped():
        raw = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(kdir)
        return raw.select(
            F.lit(None).cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit("transcripts-cdc").alias("topic"),
            F.lit(0).alias("partition"),
            F.lit(0).cast("long").alias("offset"),
            F.current_timestamp().alias("timestamp"),
        )

    ks = StreamingIndex(spark, os.path.join(root, "store"))
    ks.bootstrap(transcripts)
    n0 = transcripts.count()
    try:
        write_topic_file("part-0.json", [
            _msg(1, "zkafka", 0, "kafka shaped zebrakafka document"),
            _msg(2, "zkafka", 1, "second zebrakafka turn"),
        ])
        q = ks.ingest_stream(parse_messages(kafka_shaped()))
        assert not q.isActive  # availableNow drained and stopped
        d1 = ks.delta_ids()
        assert len(d1) == 1 and ks.current_docs().count() == n0 + 2
        assert sorted(r["doc_id"] for r in ks.search(["zebrakafka"]).collect()) == [
            "zkafka:0000", "zkafka:0001"
        ]

        # resume from checkpoint: a new topic file lands; the drained
        # file must NOT be reprocessed (exactly one new delta)
        write_topic_file("part-1.json", [
            _msg(3, "zkafka", 1, "", delete=True),
            _msg(4, "zkafka", 2, "third zebrakafka message"),
        ])
        ks.ingest_stream(parse_messages(kafka_shaped()))
        d2 = ks.delta_ids()
        assert len(d2) == len(d1) + 1
        assert ks.current_docs().count() == n0 + 2  # +1 new, -1 deleted
        assert sorted(r["doc_id"] for r in ks.search(["zebrakafka"]).collect()) == [
            "zkafka:0000", "zkafka:0002"
        ]

        # idempotent re-drain: no new input → no new deltas
        ks.ingest_stream(parse_messages(kafka_shaped()))
        assert ks.delta_ids() == d2
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_one_stream_per_index_contract(spark, transcripts):
    """Attaching a second source *endpoint or type* to an index that
    already ingested from another must raise the contract error (not
    fail deep inside Spark's checkpoint offset log, nor silently
    overwrite deltas) — while re-attaching the SAME endpoint, even via
    a differently-constructed DataFrame, stays accepted."""
    root = "/tmp/seng_source_claim"
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "in")
    other_dir = os.path.join(root, "in2")
    os.makedirs(src)
    os.makedirs(other_dir)
    with open(os.path.join(src, "b0.json"), "w") as f:
        f.write(json.dumps(_msg(1, "claim", 0, "first source")) + "\n")
    s = StreamingIndex(spark, os.path.join(root, "store"))
    s.bootstrap(transcripts.limit(50))
    try:
        s.ingest_files(src)
        from searchengine_spark.streaming.ingest import message_schema

        # same endpoint, raw reader: tag derives to files:<same dir> — OK
        same = spark.readStream.schema(message_schema()).json(src)
        s.ingest_stream(same)  # no-op drain, accepted
        # different file endpoint → rejected
        other = spark.readStream.schema(message_schema()).json(other_dir)
        with pytest.raises(ValueError, match="bound to source 'files:"):
            s.ingest_stream(other)
        # different source TYPE (e.g. a kafka topic) → rejected
        with pytest.raises(ValueError, match="bound to source 'files:"):
            s.ingest_stream(same, source_tag="kafka:b-1/topic")
        s.ingest_files(src)  # same source stays fine (no-op drain)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_large_batch_ingest(spark, transcripts):
    """A large CDC batch (100k+ messages in ONE micro-batch) must land
    without any driver-side per-doc state: tombstones go to parquet
    (meta.json carries counts only) and doc_int assignment uses the
    two-phase committed-parquet scan — no single-partition window, no
    ``isin`` literal trees, no collected doc_id lists."""
    from searchengine_spark.streaming.ingest import LARGE_BATCH_DOCS

    n_msgs = LARGE_BATCH_DOCS + 40000  # > threshold → two-phase path
    root = "/tmp/seng_large_batch"
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "in")
    os.makedirs(src)
    lines = []
    for i in range(n_msgs):
        lines.append(json.dumps(_msg(i, f"bulk{i % 50000:05d}", i // 50000,
                                     f"bulk document body tok{i % 997} zebrabulk")))
    # 10 deletes of docs upserted EARLIER in the same batch (LWW within batch)
    for j in range(10):
        lines.append(json.dumps(_msg(n_msgs + j, f"bulk{j:05d}", 0, "", delete=True)))
    with open(os.path.join(src, "big.json"), "w") as f:
        f.write("\n".join(lines) + "\n")

    s = StreamingIndex(spark, os.path.join(root, "store"))
    s.bootstrap(transcripts.limit(50))
    try:
        s.ingest_files(src)
        deltas = s.delta_ids()
        assert len(deltas) == 1
        did = deltas[0]
        ddir = os.path.join(s.delta_root, f"delta-{did}")
        meta = s._delta_meta(did)
        # counts only in meta — per-doc tombstones live in parquet
        assert "tombstones" not in meta
        n_unique = n_msgs  # one message per (conv_id, turn_idx) before deletes
        assert meta["n_tombstones"] == n_unique  # every touched id (incl. re-deleted)
        assert meta["n_docs"] == n_unique - 10
        tomb = spark.read.parquet(os.path.join(ddir, "tombstones"))
        assert tomb.count() == n_unique
        # doc_int assignment: dense, unique, starting at the watermark
        dm = spark.read.parquet(os.path.join(ddir, "docmap"))
        row = dm.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_int").alias("nd"),
            F.min("doc_int").alias("lo"),
            F.max("doc_int").alias("hi"),
        ).collect()[0]
        assert row["n"] == row["nd"] == meta["n_docs"]
        assert row["lo"] == meta["doc_int_start"]
        assert row["hi"] == meta["doc_int_end"] - 1
        # merge-on-read sees the batch: +n upserts −10 deletes
        assert s.current_docs().count() == 50 + n_unique - 10
        # live search reaches the new docs and excludes the deleted ones
        ids = [r["doc_id"] for r in s.search(["zebrabulk"], k=20).collect()]
        assert len(ids) == 20 and all(i.startswith("bulk") for i in ids)
        dead = [r["doc_id"] for r in s.search(["zebrabulk"], k=200000).collect()
                if r["doc_id"] in {f"bulk{j:05d}:0000" for j in range(10)}]
        assert dead == []
    finally:
        shutil.rmtree(root, ignore_errors=True)


@pytest.mark.parametrize("at_boundary", [True, False])
def test_large_batch_boundary_delete_heavy(spark, transcripts, monkeypatch,
                                           at_boundary):
    """The ``n_up > LARGE_BATCH_DOCS`` switch (window row_number vs
    two-phase committed-parquet scan) exactly AT the boundary, with a
    delete-heavy batch (round-4 verdict item 7). The boundary operand
    is the POST-LWW surviving-upsert count: deletes of base docs and
    in-batch upsert-then-delete pairs inflate n_tombstones but must
    not move n_up across the threshold. Both paths must agree on the
    full observable contract: meta counts, dense unique doc_ints
    assigned in doc_id order from the watermark, and merge-on-read
    visibility. Threshold is monkeypatched small so the test pins the
    boundary itself, not a 65k-row ingest (the real-size two-phase
    path is covered by test_large_batch_ingest)."""
    from searchengine_spark.streaming import ingest as ing

    thr = 512
    monkeypatch.setattr(ing, "LARGE_BATCH_DOCS", thr)
    # n_up == thr → window path; thr+1 → two-phase path
    n_up = thr if at_boundary else thr + 1

    root = f"/tmp/seng_boundary_{int(at_boundary)}"
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "in")
    os.makedirs(src)
    base = transcripts.limit(50)
    base_ids = [(r["conv_id"], r["turn_idx"])
                for r in base.select("conv_id", "turn_idx").collect()[:40]]

    seq = 0
    lines = []
    for i in range(n_up):  # surviving upserts — exactly the boundary operand
        lines.append(json.dumps(_msg(seq, f"bnd{i:05d}", 0,
                                     f"boundary body tok{i % 97} zebraboundary")))
        seq += 1
    for cid, tix in base_ids:  # delete-heavy: 40 base deletes
        lines.append(json.dumps(_msg(seq, cid, tix, "", delete=True)))
        seq += 1
    for j in range(30):  # upsert-then-delete inside the batch (LWW → dead)
        lines.append(json.dumps(_msg(seq, f"bdead{j:04d}", 0, "ephemeral zebraboundary")))
        lines.append(json.dumps(_msg(seq + 1, f"bdead{j:04d}", 0, "", delete=True)))
        seq += 2
    with open(os.path.join(src, "batch.json"), "w") as f:
        f.write("\n".join(lines) + "\n")

    s = StreamingIndex(spark, os.path.join(root, "store"))
    s.bootstrap(base)
    try:
        watermark = s._next_doc_int()
        s.ingest_files(src)
        (did,) = s.delta_ids()
        meta = s._delta_meta(did)
        assert meta["n_docs"] == n_up          # post-LWW survivors only
        assert meta["n_tombstones"] == n_up + 40 + 30
        dm = spark.read.parquet(
            os.path.join(s.delta_root, f"delta-{did}", "docmap"))
        rows = dm.select("doc_int", "doc_id").collect()
        assert len(rows) == n_up
        by_docid = sorted(rows, key=lambda r: r["doc_id"])
        # dense, unique, watermark-based, and doc_id-ordered on BOTH paths
        assert [r["doc_int"] for r in by_docid] == list(
            range(watermark, watermark + n_up))
        # merge-on-read: base − 40 deletes + survivors; dead pairs invisible
        assert s.current_docs().count() == 50 - 40 + n_up
        hits = {r["doc_id"] for r in s.search(["zebraboundary"], k=n_up + 50).collect()}
        assert not any(i.startswith("bdead") for i in hits)
        assert len(hits) == n_up
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_compact_during_live_socket_stream(spark, transcripts):
    """Round-4 concurrency contract: ``compact()`` while a continuous
    (``drain=False``) socket query is live must serialize against
    ``apply_batch`` — every message ends up exactly once in the final
    view, whether its micro-batch landed before the fold (compacted
    into the base) or after it (first delta on the new base)."""
    import socket
    import threading
    import time

    from searchengine_spark.streaming.ingest import socket_source

    root = "/tmp/seng_compact_race"
    shutil.rmtree(root, ignore_errors=True)
    s = StreamingIndex(spark, os.path.join(root, "store"))
    s.bootstrap(transcripts.limit(50))

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()
    sent = []

    def serve():
        conn, _ = srv.accept()
        with conn:
            seq = 0
            while not stop.is_set() and seq < 40:
                m = _msg(seq, "race", seq, f"racing message zebrarace tok{seq}")
                conn.sendall((json.dumps(m) + "\n").encode())
                sent.append(m["doc_id"])
                seq += 1
                time.sleep(0.05)
            stop.wait(timeout=60)

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    q = s.ingest_stream(socket_source(spark, "127.0.0.1", port), drain=False)
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not s.delta_ids():
            time.sleep(0.3)
        assert s.delta_ids(), "no delta landed before compaction"
        # fold the base while batches keep arriving
        s.compact()
        n_base = s.catalog.current().stats["n_docs"]
        assert n_base > 50  # compacted-in stream docs
        # let the tail of the stream land, then stop
        deadline = time.time() + 60
        while time.time() < deadline and len(sent) < 40:
            time.sleep(0.3)
        # wait until every sent message has been published to the store
        deadline = time.time() + 90
        while time.time() < deadline:
            n = s.current_docs().where(F.col("conv_id") == "race").count()
            if n >= len(sent):
                break
            time.sleep(1.0)
    finally:
        stop.set()
        q.stop()
        q.awaitTermination(30)
        srv.close()
    try:
        # exactly-once across the fold: every sent doc present exactly once
        cur = s.current_docs().where(F.col("conv_id") == "race")
        got = sorted(f"{r['conv_id']}:{r['turn_idx']:04d}" for r in cur.collect())
        assert got == sorted(set(sent))
        ids = [r["doc_id"] for r in s.search(["zebrarace"], k=100).collect()]
        assert set(ids) == set(sent)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_sessionize_stream_matches_batch(spark):
    """The Structured Streaming session_window query and the batch
    window-chain sessionize are result-identical on the same events
    (the sentinel punctuation row must flush every real session and
    never leak into the output)."""
    from searchengine_spark.ops.sessions import sessionize
    from searchengine_spark.streaming.events import events_sessionize_stream

    sf_dir = "/root/testdata/sf0.001"
    batch = [tuple(r) for r in sessionize(spark.read.parquet(f"{sf_dir}/events.parquet")).collect()]
    stream = [tuple(r) for r in events_sessionize_stream(spark, sf_dir).collect()]
    assert len(batch) == len(stream) > 0
    assert batch == stream
    assert all(r[0] >= 0 for r in stream)  # sentinel user filtered


@pytest.mark.parametrize("shards", [None, 8])
def test_conv_assembly_merges_state_across_batches(spark, tmp_path, shards):
    """A conversation whose turns arrive in DIFFERENT micro-batches must
    assemble from keyed state: two staged files split the turns, a third
    carries the sentinel; maxFilesPerTrigger=1 forces three batches.
    Runs both state layouts — per-conversation and shard-packed
    (``shards=8`` > n_convs, so some shards hold one conv, most none,
    and the cross-batch merge goes through the packed map)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_spark.streaming.assemble import SENTINEL_CONV, run_assembly

    base_us = 1_700_000_000_000_000

    def turns_table(rows):
        return pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array(["x"] * len(rows), pa.string()),
                "tool": pa.array([""] * len(rows), pa.string()),
                "ts": pa.array([base_us + r[1] * 13_000_000 for r in rows], pa.timestamp("us")),
            }
        )

    d = str(tmp_path / "turns")
    import os

    os.makedirs(d)
    # batch 1: first halves; batch 2: second halves (out of order within conv)
    pq.write_table(turns_table([("cA", 0, "user"), ("cB", 0, "user"), ("cA", 1, "assistant")]),
                   f"{d}/part-00000.parquet")
    pq.write_table(turns_table([("cB", 2, "tool"), ("cA", 2, "system"), ("cB", 1, "assistant")]),
                   f"{d}/part-00001.parquet")
    sent = turns_table([(SENTINEL_CONV, 999999, "system")])
    pq.write_table(sent, f"{d}/part-00002.parquet")
    # the file source orders micro-batches by modification time; three
    # writes can tie at ms granularity, letting the sentinel batch run
    # FIRST (its watermark then late-drops every real turn → empty
    # output). Pin strictly increasing mtimes so batch order is the
    # staged order.
    for i in range(3):
        os.utime(f"{d}/part-0000{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    out = {r["conv_id"]: r for r in run_assembly(
        spark, d, gap_minutes=60, max_files_per_trigger=1, shards=shards
    ).collect()}
    assert set(out) == {"cA", "cB"}
    assert out["cA"]["n_turns"] == 3 and out["cA"]["role_seq"] == "uas"
    assert out["cB"]["n_turns"] == 3 and out["cB"]["role_seq"] == "uat"


@pytest.mark.parametrize("shards", [None, 8])
def test_conv_assembly_null_and_empty_roles(spark, tmp_path, shards):
    """NULL and empty-string roles must contribute NOTHING to the role
    signature (batch-twin array_join-skips-nulls semantics) while still
    counting as turns — and must not shift later initials against their
    turn_idx (the packed-initials string uses a stripped placeholder,
    not a zero-width ''). Regression test: a bare '' per null role
    desynchronized the argsort reorder and could IndexError at
    emission."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_spark.streaming.assemble import SENTINEL_CONV, run_assembly

    base_us = 1_700_000_000_000_000
    rows = [  # (conv, turn_idx, role) — arrival order ≠ turn order
        ("cN", 2, None), ("cN", 0, "user"), ("cN", 3, "assistant"),
        ("cN", 1, ""), ("cE", 0, None), ("cE", 1, ""),
    ]
    tab = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows] + [SENTINEL_CONV], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows] + [999999], pa.int32()),
            "role": pa.array([r[2] for r in rows] + ["system"], pa.string()),
            "text": pa.array(["x"] * (len(rows) + 1), pa.string()),
            "tool": pa.array([""] * (len(rows) + 1), pa.string()),
            "ts": pa.array(
                [base_us + r[1] * 13_000_000 for r in rows]
                + [base_us + 999999 * 13_000_000],
                pa.timestamp("us"),
            ),
        }
    )
    d = str(tmp_path / "turns")
    os.makedirs(d)
    pq.write_table(tab, f"{d}/part-00000.parquet")
    out = {r["conv_id"]: r for r in run_assembly(spark, d, shards=shards).collect()}
    assert set(out) == {"cN", "cE"}
    # cN: turns 0..3 = user, "", None, assistant → signature "ua"
    assert out["cN"]["n_turns"] == 4 and out["cN"]["role_seq"] == "ua"
    # all-null/empty conversation: counted turns, empty signature
    assert out["cE"]["n_turns"] == 2 and out["cE"]["role_seq"] == ""


def test_conv_assembly_sharded_matches_per_conv(spark):
    """The shard-packed state layout must be row-identical to the
    per-conversation layout on the real corpus — single-batch and
    multi-batch (cross-batch packed-map merge) replays both."""
    from searchengine_spark.streaming.assemble import (
        ASSEMBLY_GAP_MINUTES, run_assembly, stage_turn_stream_dir,
    )
    from searchengine_spark.corpus import ensure_transcripts

    d = stage_turn_stream_dir(ensure_transcripts(0.001), ASSEMBLY_GAP_MINUTES)
    base = [tuple(r) for r in run_assembly(spark, d).collect()]
    assert len(base) > 0
    sharded = [tuple(r) for r in run_assembly(spark, d, shards=64).collect()]
    assert sharded == base
    multi = [tuple(r) for r in run_assembly(
        spark, d, shards=64, max_files_per_trigger=1
    ).collect()]
    assert multi == base


def test_sessionize_exact_gap_boundary_agrees(spark):
    """An event at EXACTLY prev + gap extends the session in both the
    batch op (strict > gap rule) and native session_window (merges
    touching intervals) — pinned so neither can drift."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from searchengine_spark.ops.sessions import sessionize

    base = datetime(2024, 1, 1)
    rows = [
        (1, base, 7, "x", 1.0),
        (2, base + timedelta(minutes=30), 7, "x", 1.0),          # exact gap: same session
        (3, base + timedelta(minutes=60, seconds=1), 7, "x", 1.0),  # 30m1s: new session
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE"
    )
    batch = sessionize(df).collect()
    assert [r["n_events"] for r in batch] == [2, 1]
    native = (
        df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(r["n"] for r in native) == [1, 2]

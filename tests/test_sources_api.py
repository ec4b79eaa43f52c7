"""Spark 4 Python Data Source API: the rest_pages executor-parallel
REST connector — partition-per-page layout, synthetic and http
transports, and option validation."""

from __future__ import annotations

import http.server
import threading
from urllib.parse import parse_qs, urlparse

import pytest

from mcyj_datapipeline_spark.sources import (
    register_rest_source,
    synth_page_payload,
)


def _read(spark, **opts):
    register_rest_source(spark)
    r = spark.read.format("rest_pages")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_partition_per_page_and_deterministic_rows(spark):
    df = _read(spark, pages=6, page_size=10)
    assert df.rdd.getNumPartitions() == 6
    rows = {r["agency_id"]: r for r in df.collect()}
    assert len(rows) == 60
    assert rows["AG00003"]["status"] == "ACTIVE"
    assert rows["AG00003"]["license_capacity"] == 21
    assert rows["AG00059"]["page"] == 5


def test_catalyst_filters_compose_over_the_source(spark):
    """The source is a normal relation: filters/aggregations plan on
    top of it like any scan."""
    df = _read(spark, pages=4, page_size=25)
    agg = (
        df.filter(df.status == "ACTIVE")
        .groupBy("status")
        .count()
        .collect()
    )
    assert agg[0]["count"] == 34  # ids 0,3,...,99 -> ceil(100/3)


def test_http_transport_serves_same_rows(spark):
    """mode=http against a local threaded server returning the same
    wire payload must produce byte-identical rows to synthetic."""

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            body = synth_page_payload(
                int(q["page"][0]), int(q["page_size"][0])
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}/agencies"
        via_http = _read(
            spark, pages=3, page_size=7, mode="http", base_url=base
        ).collect()
        via_synth = _read(spark, pages=3, page_size=7).collect()
        assert sorted(via_http) == sorted(via_synth)
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_mode_requires_base_url(spark):
    with pytest.raises(Exception, match="base_url"):
        _read(spark, pages=1, page_size=1, mode="http").collect()


def test_stream_reader_paces_and_delivers_exactly_once_within_run(
    spark, tmp_path
):
    """Micro-batch stream over the paginated feed: every batch holds at
    most pages_per_batch*page_size rows, all 30 rows arrive, none
    twice (within one run the page-number offset is exactly-once)."""
    register_rest_source(spark)
    import time

    sdf = (
        spark.readStream.format("rest_pages")
        .option("pages", "6")
        .option("page_size", "5")
        .option("pages_per_batch", "2")
        .load()
    )
    batches = []
    q = (
        sdf.writeStream.foreachBatch(
            lambda df, e: batches.append(
                sorted(r["agency_id"] for r in df.collect())
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline and sum(map(len, batches)) < 30:
        time.sleep(0.5)
    q.stop()
    flat = [i for b in batches for i in b]
    assert sorted(flat) == sorted(set(flat)), "duplicate delivery in-run"
    assert len(flat) == 30
    assert all(len(b) <= 10 for b in batches), "batch exceeded pacing"


def test_stream_restart_resumes_from_checkpointed_page(spark, tmp_path):
    """A second query on the same checkpoint must never re-deliver a
    COMMITTED batch: allowed redelivery is only the final uncommitted
    tail batch (standard foreachBatch at-least-once), so the earliest
    pages can appear exactly once across both runs."""
    register_rest_source(spark)
    import time

    ckpt = str(tmp_path / "ckpt")

    def run(stop_when, timeout=60):
        got = []
        sdf = (
            spark.readStream.format("rest_pages")
            .option("pages", "4")
            .option("page_size", "5")
            .option("pages_per_batch", "1")
            .load()
        )
        q = (
            sdf.writeStream.foreachBatch(
                lambda df, e: got.append(
                    sorted(r["agency_id"] for r in df.collect())
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + timeout
        while time.time() < deadline and not stop_when(got):
            time.sleep(0.5)
        q.stop()
        return got

    # stop run 1 mid-feed (after pages 0-1); run 2 must drain the rest
    # of the bounded feed, so wait for its LAST row (stopping at the
    # first nonempty batch would race the engine to the later pages)
    first = run(lambda got: sum(map(len, got)) >= 10)
    second = run(
        lambda got: any("AG00019" in b for b in got), timeout=60
    )
    flat1 = {i for b in first for i in b}
    flat2 = {i for b in second for i in b}
    # page 0 was committed once page 1 was planned — it must not recur
    assert "AG00000" in flat1 and "AG00000" not in flat2
    # and the union must cover the whole bounded feed
    assert len(flat1 | flat2) == 20


def test_jsonl_atomic_write_commit_and_readback(spark, tmp_path):
    """Happy path: staged files are published by the manifest swap and
    read_jsonl_atomic returns exactly the written rows; append mode
    extends the manifest."""
    from mcyj_datapipeline_spark.sources import (
        read_jsonl_atomic,
        register_jsonl_atomic,
    )

    register_jsonl_atomic(spark)
    target = str(tmp_path / "sink")
    df = spark.range(0, 100, 1, 4).selectExpr(
        "id", "concat('row', id) AS name"
    )
    df.write.format("jsonl_atomic").mode("overwrite").save(target)
    back = read_jsonl_atomic(spark, target)
    assert back.count() == 100
    assert sorted(r["id"] for r in back.collect()) == list(range(100))
    # append extends
    spark.range(100, 120, 1, 2).selectExpr(
        "id", "concat('row', id) AS name"
    ).write.format("jsonl_atomic").mode("append").save(target)
    assert read_jsonl_atomic(spark, target).count() == 120
    # no staging leftovers
    import os

    assert os.listdir(os.path.join(target, "_staging")) == []


def test_jsonl_atomic_failed_job_publishes_nothing(spark, tmp_path):
    """Two-phase commit: a task failure mid-job must leave the
    manifest absent and no committed part files — half-written jobs
    are invisible to readers."""
    import glob
    import os

    import pytest as _pytest

    from mcyj_datapipeline_spark.sources import register_jsonl_atomic

    register_jsonl_atomic(spark)
    target = str(tmp_path / "sink2")

    from pyspark.sql.functions import udf

    @udf("long")
    def boom(x):
        if x == 7:
            raise RuntimeError("planted task failure")
        return x

    df = spark.range(0, 16, 1, 4).select(boom("id").alias("id"))
    with _pytest.raises(Exception, match="planted task failure"):
        df.write.format("jsonl_atomic").mode("overwrite").save(target)
    assert not os.path.exists(os.path.join(target, "_committed.json"))
    assert glob.glob(os.path.join(target, "*.jsonl")) == []


def test_stream_quartet_rest_pages_into_jsonl_atomic(spark, tmp_path):
    """Full Data Source API quartet: stream-read the paginated feed,
    stream-write through the two-phase-commit sink — every row lands
    exactly once, manifest keyed per epoch."""
    import json
    import os
    import time

    from mcyj_datapipeline_spark.sources import (
        read_jsonl_atomic,
        register_jsonl_atomic,
    )

    register_rest_source(spark)
    register_jsonl_atomic(spark)
    sdf = (
        spark.readStream.format("rest_pages")
        .option("pages", "6")
        .option("page_size", "5")
        .option("pages_per_batch", "2")
        .load()
    )
    target = str(tmp_path / "sink")
    q = (
        sdf.writeStream.format("jsonl_atomic")
        .option("path", target)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    mp = os.path.join(target, "_committed.json")
    deadline = time.time() + 90
    while time.time() < deadline:
        if os.path.exists(mp) and json.load(open(mp)).get("rows", 0) >= 30:
            break
        time.sleep(0.5)
    assert q.exception() is None
    q.stop()
    manifest = json.load(open(mp))
    assert manifest["rows"] == 30
    assert len(manifest["epochs"]) == 3  # pages_per_batch pacing held
    back = read_jsonl_atomic(spark, target)
    ids = sorted(r["agency_id"] for r in back.collect())
    assert len(ids) == len(set(ids)) == 30


def test_stream_writer_epoch_recommit_is_idempotent(tmp_path):
    """A replayed micro-batch (same batchId) must REPLACE its epoch's
    files and row count, never double-append — the property that makes
    at-least-once replay effectively exactly-once."""
    import json
    import os

    from mcyj_datapipeline_spark.sources import (
        JsonlAtomicStreamWriter,
        StagedFile,
    )

    target = str(tmp_path / "sink")
    os.makedirs(os.path.join(target, "_staging"))
    w = JsonlAtomicStreamWriter({"path": target})

    def staged(name, rows):
        p = os.path.join(target, "_staging", name)
        with open(p, "w") as fh:
            fh.write('{"x": 1}\n' * rows)
        return StagedFile(p, rows)

    w.commit([staged("part-a.jsonl", 5)], batchId=0)
    w.commit([staged("part-b.jsonl", 7)], batchId=1)
    # replay epoch 1 with a different staged file
    w.commit([staged("part-c.jsonl", 7)], batchId=1)
    m = json.load(open(os.path.join(target, "_committed.json")))
    assert m["rows"] == 12  # 5 + 7, NOT 5 + 7 + 7
    assert m["epochs"]["1"] == ["part-c.jsonl"]
    assert "part-b.jsonl" not in m["files"]


def test_jsonl_atomic_empty_write_commits_empty_manifest(spark, tmp_path):
    """Zero-row job: staged empties are discarded, the manifest still
    publishes (files=[]) and the reader returns an empty relation."""
    import json
    import os

    from mcyj_datapipeline_spark.sources import (
        read_jsonl_atomic,
        register_jsonl_atomic,
    )

    register_jsonl_atomic(spark)
    target = str(tmp_path / "sink")
    spark.range(0, 0, 1, 4).write.format("jsonl_atomic").mode(
        "overwrite"
    ).save(target)
    m = json.load(open(os.path.join(target, "_committed.json")))
    assert m == {"files": [], "rows": 0, "gen": 1}
    assert read_jsonl_atomic(spark, target).count() == 0


def test_jsonl_atomic_roundtrip_random_rows(spark, tmp_path):
    """Seeded random rows (ints, unicode strings, nulls) survive the
    stage->commit->manifest->read cycle exactly."""
    import random

    from mcyj_datapipeline_spark.sources import (
        read_jsonl_atomic,
        register_jsonl_atomic,
    )

    rng = random.Random(7)
    alphabet = "abcXYZ äöü 日本語 \"quotes\" \\slash\t"
    rows = [
        (
            i,
            rng.randint(-(2**40), 2**40),
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
            if rng.random() > 0.2
            else None,
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, v long, s string")
    register_jsonl_atomic(spark)
    target = str(tmp_path / "sink")
    df.repartition(8).write.format("jsonl_atomic").mode("overwrite").save(
        target
    )
    back = read_jsonl_atomic(spark, target).select("id", "v", "s")
    got = {(r["id"], r["v"], r["s"]) for r in back.collect()}
    assert got == set(rows)


def test_stream_commit_after_batch_write_keeps_batch_rows(spark, tmp_path):
    """Mixed usage: a stream commit onto a BATCH-written manifest must
    keep the batch rows in the ledger (epoch_rows seeding), not drop
    them from the recomputed total."""
    import json
    import os

    from mcyj_datapipeline_spark.sources import (
        JsonlAtomicStreamWriter,
        StagedFile,
        register_jsonl_atomic,
    )

    register_jsonl_atomic(spark)
    target = str(tmp_path / "sink")
    spark.range(0, 10, 1, 2).write.format("jsonl_atomic").mode(
        "overwrite"
    ).save(target)
    w = JsonlAtomicStreamWriter({"path": target})
    staged = os.path.join(target, "_staging", "part-x.jsonl")
    with open(staged, "w") as fh:
        fh.write('{"id": 99}\n' * 4)
    w.commit([StagedFile(staged, 4)], batchId=0)
    m = json.load(open(os.path.join(target, "_committed.json")))
    assert m["rows"] == 14  # 10 batch + 4 stream
    assert set(m["epochs"]) == {"batch", "0"}


# ---------------------------------------------------------------------------
# Restart-safety unit tests: drive the stream reader exactly the way
# MicroBatchExecution does (offsets, partitions, commits), including
# the clean-stop restart where the first latestOffset() of a FRESH
# reader answers from scratch while the engine holds a further-along
# checkpointed start. No page may ever be re-delivered once committed.
# ---------------------------------------------------------------------------


def _drain(reader, start, max_batches=50):
    """Engine-loop simulation: poll latestOffset, plan partitions,
    commit; returns the pages delivered and the final offset."""
    delivered = []
    for _ in range(max_batches):
        end = reader.latestOffset()
        if end["page"] == start["page"]:
            break
        delivered += [p.value for p in reader.partitions(start, end)]
        reader.commit(end)
        start = end
    return delivered, start


def test_stream_reader_clean_restart_no_redelivery():
    from mcyj_datapipeline_spark.sources import RestPagesStreamReader

    opts = {"pages": "6", "page_size": "5", "pages_per_batch": "2"}
    r1 = RestPagesStreamReader(opts)
    got, final = _drain(r1, r1.initialOffset())
    assert got == list(range(6))
    assert final == {"page": 6}
    # clean stop: everything committed. A restart builds a FRESH
    # reader whose first latestOffset may regress behind the
    # checkpointed start — the engine then feeds the checkpointed
    # start back through partitions(). Committed pages must not recur.
    r2 = RestPagesStreamReader(opts)
    redelivered, _ = _drain(r2, {"page": 6})
    assert redelivered == []


def test_stream_reader_midstream_restart_resumes_without_duplicates():
    from mcyj_datapipeline_spark.sources import RestPagesStreamReader

    opts = {"pages": "8", "page_size": "5", "pages_per_batch": "3"}
    # restart with pages 0-4 already committed (checkpointed start=5):
    # the fresh reader's first poll regresses to page 3; the clamp
    # must deliver exactly 5..8, never 3..5 again
    r = RestPagesStreamReader(opts)
    got, final = _drain(r, {"page": 5})
    assert got == [5, 6, 7]
    assert final == {"page": 8}


def test_stream_reader_pending_batch_replay_still_replays():
    from mcyj_datapipeline_spark.sources import RestPagesStreamReader

    opts = {"pages": "6", "page_size": "5", "pages_per_batch": "2"}
    # crash with batch (2,4) planned but uncommitted: on restart the
    # engine calls partitions() with the LOGGED offsets before any
    # latestOffset — the tail batch must replay in full (at-least-once
    # recovery), then the stream continues past it without duplicates
    r = RestPagesStreamReader(opts)
    replay = [p.value for p in r.partitions({"page": 2}, {"page": 4})]
    assert replay == [2, 3]
    r.commit({"page": 4})
    rest, final = _drain(r, {"page": 4})
    assert rest == [4, 5]
    assert final == {"page": 6}


def test_jsonl_overwrite_vacuums_prior_files_and_staging(spark, tmp_path):
    """Overwrite must unpublish AND delete the previous manifest's
    part files (directory readers would otherwise see ghost rows) and
    sweep orphans left in _staging by earlier failed jobs."""
    import json
    import os

    from mcyj_datapipeline_spark.sources import (
        read_jsonl_atomic,
        register_jsonl_atomic,
    )

    register_jsonl_atomic(spark)
    target = str(tmp_path / "sink")
    spark.range(0, 50, 1, 4).write.format("jsonl_atomic").mode(
        "overwrite"
    ).save(target)
    first_parts = {
        f for f in os.listdir(target) if f.endswith(".jsonl")
    }
    assert first_parts
    # plant an orphan from a "crashed" earlier job
    os.makedirs(os.path.join(target, "_staging"), exist_ok=True)
    orphan = os.path.join(target, "_staging", "part-dead.jsonl")
    with open(orphan, "w") as fh:
        fh.write('{"id": -1}\n')
    spark.range(100, 120, 1, 2).write.format("jsonl_atomic").mode(
        "overwrite"
    ).save(target)
    survivors = {f for f in os.listdir(target) if f.endswith(".jsonl")}
    assert survivors.isdisjoint(first_parts), "ghost parts survive overwrite"
    assert not os.path.exists(orphan), "stale staging not swept"
    # directory-level read now agrees with the manifest read
    back = read_jsonl_atomic(spark, target)
    assert sorted(r["id"] for r in back.collect()) == list(range(100, 120))
    raw = spark.read.json(os.path.join(target, "*.jsonl"))
    assert raw.count() == 20
    m = json.load(open(os.path.join(target, "_committed.json")))
    assert m["rows"] == 20


def test_jsonl_stream_replayed_epoch_vacuums_superseded_files(spark, tmp_path):
    """A replayed micro-batch replaces its epoch's manifest entry; the
    superseded files must be deleted, not orphaned."""
    import json
    import os

    from mcyj_datapipeline_spark.sources import (
        JsonlAtomicStreamWriter,
        StagedFile,
    )

    target = str(tmp_path / "sink")
    os.makedirs(os.path.join(target, "_staging"))

    def stage(name, rows):
        p = os.path.join(target, "_staging", name)
        with open(p, "w") as fh:
            for i in range(rows):
                fh.write(json.dumps({"id": i}) + "\n")
        return StagedFile(p, rows)

    w = JsonlAtomicStreamWriter({"path": target})
    w.commit([stage("part-a.jsonl", 3)], batchId=0)
    assert os.path.exists(os.path.join(target, "part-a.jsonl"))
    # replay of epoch 0 with a different uuid part
    w.commit([stage("part-b.jsonl", 3)], batchId=0)
    assert not os.path.exists(os.path.join(target, "part-a.jsonl"))
    m = json.load(open(os.path.join(target, "_committed.json")))
    assert m["files"] == ["part-b.jsonl"]
    assert m["rows"] == 3


def test_stream_reader_protocol_recovery_paths():
    """Unit-level simulation of the three restart call-sequences the
    engine actually issues (no Spark needed — the reader is plain
    Python). Round 5 root-cause regression: the engine's restart
    initialization PROBE partitions(latest, latest) passes a logged but
    possibly UNCOMMITTED offset; treating it as delivered clamped the
    pending-batch replay to empty and silently lost a page."""
    from mcyj_datapipeline_spark.sources import RestPagesStreamReader

    opts = {"pages": "4", "page_size": "5", "pages_per_batch": "1"}

    def pages(parts):
        return [p.value for p in parts]

    # -- path 1: crash with a pending batch (the round-5 data-loss bug)
    r = RestPagesStreamReader(opts)
    assert pages(r.partitions({"page": 3}, {"page": 3})) == []  # probe
    # the pending batch REPLAYS IN FULL — the probe must not have
    # raised the no-redeliver floor past it
    assert pages(r.partitions({"page": 2}, {"page": 3})) == [2]
    r.commit({"page": 3})
    # catch-up resumes past the probe offset, not from scratch
    assert r.latestOffset() == {"page": 4}
    assert pages(r.partitions({"page": 3}, {"page": 4})) == [3]

    # -- path 2: clean restart where latestOffset answers FIRST
    # (self-inflicted regressed offset; engine logs end < position)
    r = RestPagesStreamReader(opts)
    assert r.latestOffset() == {"page": 1}  # knows nothing yet
    # engine: start = committed position 2, end = our regressed 1
    assert pages(r.partitions({"page": 2}, {"page": 1})) == []
    r.commit({"page": 1})
    # converged forward; the next real batch starts at the regressed
    # end but must NOT re-deliver committed pages below the floor
    assert r.latestOffset()["page"] >= 2
    assert pages(r.partitions({"page": 1}, {"page": 3})) == [2]
    r.commit({"page": 3})
    assert pages(r.partitions({"page": 3}, {"page": 4})) == [3]

    # -- path 3: plain first run paces by pages_per_batch to the bound
    r = RestPagesStreamReader(opts)
    assert r.initialOffset() == {"page": 0}
    assert r.latestOffset() == {"page": 1}
    assert pages(r.partitions({"page": 0}, {"page": 1})) == [0]
    r.commit({"page": 1})
    assert r.latestOffset() == {"page": 2}
    assert pages(r.partitions({"page": 1}, {"page": 2})) == [1]
    r.commit({"page": 2})
    for _ in range(3):  # polls never pace past the bounded feed
        assert r.latestOffset()["page"] <= 4

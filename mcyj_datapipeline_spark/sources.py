"""Spark 4 Python Data Source API connectors.

:func:`io.from_api_rows` (S6/S7) materializes a REST payload on the
DRIVER — correct for the reference's few-hundred-row agency feed
(``pull_agency_info_api.py:10-41``) but a dead end at scale: one
process fetches everything, then parallelism starts. The
``rest_pages`` source here moves the fetch to the EXECUTORS with the
V2-style Python Data Source API (public in Spark 4): every REST page
is an ``InputPartition``, so a 10k-page API dump fans out across the
cluster, retries ride Spark's task retry, and the result lands
already partitioned — no driver bottleneck and no collect-then-
parallelize hop.

The transport is injectable: ``mode=synthetic`` (default) generates a
deterministic page payload executor-side — same shape a paginated
agency API returns — which makes the source testable offline AND
gives the registry query a closed-form DuckDB oracle; ``mode=http``
fetches ``{base_url}?page={p}&page_size={n}`` with stdlib urllib and
parses the same JSON shape. Tests exercise the http path through a
local handler seam, keeping the sandbox network-free.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

REST_PAGES_SCHEMA = StructType(
    [
        StructField("page", IntegerType()),
        StructField("agency_id", StringType()),
        StructField("name", StringType()),
        StructField("status", StringType()),
        StructField("license_capacity", LongType()),
    ]
)

_STATUSES = ("ACTIVE", "PENDING", "CLOSED")


def synth_page_payload(page: int, page_size: int) -> str:
    """Deterministic JSON payload for one page — the wire format a
    paginated agency endpoint would return (``responseResult`` array,
    reference ``run_full_pipeline.py:348-352``). Used by the synthetic
    transport and by the http-path tests as the served fixture."""
    rows = []
    for idx in range(page_size):
        i = page * page_size + idx
        rows.append(
            {
                "agency_id": "AG%05d" % i,
                "name": "Agency %d" % i,
                "status": _STATUSES[i % 3],
                "license_capacity": (i * 7) % 200,
            }
        )
    return json.dumps({"returnValue": {"responseResult": rows}})


def _parse_page(page: int, payload: str) -> Iterator[tuple]:
    for r in json.loads(payload)["returnValue"]["responseResult"]:
        yield (
            page,
            r["agency_id"],
            r["name"],
            r["status"],
            int(r["license_capacity"]),
        )


class RestPagesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_pages = int(options.get("pages", "4"))
        self.page_size = int(options.get("page_size", "25"))
        self.mode = options.get("mode", "synthetic")
        self.base_url = options.get("base_url", "")
        if self.mode == "http" and not self.base_url:
            raise ValueError("rest_pages: mode=http requires base_url")

    def partitions(self):
        # one partition PER PAGE: pagination is the parallelism unit,
        # so executors fetch pages concurrently and a failed fetch
        # retries only its own page
        return [InputPartition(p) for p in range(self.n_pages)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        page = partition.value
        if self.mode == "synthetic":
            payload = synth_page_payload(page, self.page_size)
        else:
            from urllib.request import urlopen

            url = f"{self.base_url}?page={page}&page_size={self.page_size}"
            with urlopen(url, timeout=30) as resp:  # noqa: S310
                payload = resp.read().decode("utf-8")
        yield from _parse_page(page, payload)


class RestPagesStreamReader(DataSourceStreamReader):
    """Micro-batch reader over the same paginated feed: the offset IS
    the next page number, so Structured Streaming's checkpoint gives
    exactly-once page consumption for free (a restarted query resumes
    from the checkpointed page, not page 0). Each batch advances by at
    most ``pages_per_batch``; within a batch every page is its own
    ``InputPartition``, fetched executor-side exactly like the batch
    reader — ingestion keeps up by widening the batch, not the driver.
    The feed is bounded at ``pages`` total (a live endpoint would
    instead probe for new pages in ``latestOffset``).

    Restart safety: progress lives in the CHECKPOINT, not in this
    driver-memory object, so a fresh reader knows nothing until the
    engine talks to it. The engine's calls carry the recovery state,
    and the three ``partitions(start, end)`` span shapes mean
    different things:

    - ``start == end`` — the engine's restart INITIALIZATION PROBE,
      passing its latest *logged* offset (which may belong to an
      uncommitted batch). It proves engine position, NOT delivery:
      the probe only raises ``_pos`` (position high-water used by
      ``latestOffset`` so a fresh reader never answers behind the
      checkpoint) and never the no-redeliver ``_floor``. Treating the
      probe's start as "delivered" would clamp the subsequent replay
      of the pending batch to empty and silently LOSE its pages.
    - ``start < end`` — a real batch (first run, catch-up, or the
      at-least-once replay of the one uncommitted tail batch). It
      delivers ``[max(start, floor), end)``: the floor only guards
      pages *below* start against re-delivery after an offset
      regression, never the batch's own span.
    - ``start > end`` — the self-inflicted regressed span (a fresh
      reader's ``latestOffset`` answered before any engine call and
      the engine logged it as a batch end below its position). It is
      empty by construction; ``start`` here is the engine's committed
      position after a clean stop, so it raises both ``_pos`` and
      ``_floor`` and the reader converges forward without
      re-delivering committed pages.

    Delivery guarantee: exactly-once within a run and across clean
    restarts (the probe/regression handling above recovers the floor
    before pages flow); across crash-restarts the standard streaming
    at-least-once contract applies — the one uncommitted tail batch
    replays in full, and a crash landing between a regressed offset
    write and its catch-up commit can re-deliver committed pages to
    a fresh process. Sinks needing exactly-once must therefore be
    idempotent on (page, agency_id), as the jsonl_atomic manifest
    sink is."""

    def __init__(self, options: dict) -> None:
        self.inner = RestPagesReader(options)
        self.pages_per_batch = int(options.get("pages_per_batch", "2"))
        self._planned = 0
        self._pos = 0  # engine position high-water (logged, maybe uncommitted)
        self._floor = 0  # no-redeliver line: engine-proven committed pages
        self._log("init")

    def _log(self, msg: str) -> None:
        import os

        path = os.environ.get("REST_PAGES_TRACE", "")
        if path:
            with open(path, "a") as fh:
                fh.write(
                    f"{os.getpid()} {msg} planned={self._planned} "
                    f"pos={self._pos} floor={self._floor}\n"
                )

    def initialOffset(self) -> dict:
        self._log("initialOffset")
        return {"page": 0}

    def latestOffset(self) -> dict:
        # advance monotonically from whatever is furthest along —
        # planned (this process) or the engine-observed position — so
        # repeated polls without commits don't re-plan the same span
        # and a restarted reader catches back up past the checkpoint
        # the moment the engine has revealed it (probe/replay/commit)
        self._planned = max(
            min(
                max(self._planned, self._pos) + self.pages_per_batch,
                self.inner.n_pages,
            ),
            self._pos,
        )
        self._log("latestOffset ->")
        return {"page": self._planned}

    def partitions(self, start: dict, end: dict):
        s, e = start["page"], end["page"]
        self._pos = max(self._pos, s, e)
        self._planned = max(self._planned, self._pos)
        if s >= e:
            # s == e: restart initialization probe — position only, no
            # delivery claim (s may be an UNCOMMITTED batch end; raising
            # the floor here would clamp the pending replay to empty and
            # lose its pages). s > e: regressed span — empty, and s is
            # the engine's committed position after a clean stop.
            if s > e:
                self._floor = max(self._floor, s)
            self._log(f"partitions start={start} end={end} -> empty")
            return []
        lo = max(s, self._floor)
        self._floor = max(self._floor, s)
        self._log(f"partitions start={start} end={end} lo={lo}")
        return [InputPartition(p) for p in range(lo, e)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        return self.inner.read(partition)

    def commit(self, end: dict) -> None:
        self._floor = max(self._floor, end["page"])
        self._pos = max(self._pos, end["page"])
        self._log(f"commit end={end}")


class RestPagesSource(DataSource):
    """``spark.read.format("rest_pages")`` — executor-parallel
    paginated REST JSON source; ``spark.readStream`` gives the
    micro-batch variant with page-number offsets."""

    @classmethod
    def name(cls) -> str:
        return "rest_pages"

    def schema(self) -> StructType:
        return REST_PAGES_SCHEMA

    def reader(self, schema: StructType) -> RestPagesReader:
        return RestPagesReader(self.options)

    def streamReader(self, schema: StructType) -> RestPagesStreamReader:
        return RestPagesStreamReader(self.options)


def register_rest_source(spark) -> None:
    """Idempotent registration of the ``rest_pages`` format on a
    session (re-registering simply replaces the prior entry)."""
    spark.dataSource.register(RestPagesSource)


# ---------------------------------------------------------------------------
# jsonl_atomic — a Data Source API WRITER with a real two-phase commit:
# tasks stage uuid-named files and return them as commit messages; the
# driver's commit() publishes them in ONE manifest swap, abort() deletes
# them. Readers resolve the manifest, so half-written jobs are invisible
# — the Hadoop-committer/Delta-log contract, stated in ~60 lines of
# Python. On an object store the same mechanics apply (stage under a
# job prefix, manifest swap via put-if-absent).
# ---------------------------------------------------------------------------


class StagedFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class JsonlAtomicWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path", "")
        if not self.path:
            raise ValueError("jsonl_atomic: a target path is required")
        self.overwrite = overwrite

    def write(self, iterator) -> StagedFile:
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        part = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return StagedFile(part, n)

    def commit(self, messages) -> None:
        import os

        prev = None
        if os.path.exists(self._manifest_path()):
            with open(self._manifest_path()) as fh:
                prev = json.load(fh)
        files, total = [], 0
        for m in messages:
            if m is None or m.rows == 0:
                if m is not None:
                    os.remove(m.path)
                continue
            final = os.path.join(self.path, os.path.basename(m.path))
            os.replace(m.path, final)  # atomic on one filesystem
            files.append(os.path.basename(final))
            total += m.rows
        manifest = {"files": sorted(files), "rows": total}
        if not self.overwrite and prev is not None:
            manifest = {
                "files": sorted(prev.get("files", []) + manifest["files"]),
                "rows": prev.get("rows", 0) + total,
            }
        # generation counter: every commit also publishes an immutable
        # _committed.v{N}.json snapshot of the live manifest — the
        # poor-man's-Delta-log that makes read_jsonl_atomic(version=K)
        # time travel possible. APPEND generations share their file
        # sets (append never deletes), so every historical version
        # stays readable; OVERWRITE vacuums unreferenced files, which
        # invalidates prior generations — so it also resets the
        # version history (old v-manifests removed below, gen -> 1).
        gen = 1 if (self.overwrite or prev is None) else prev.get("gen", 0) + 1
        manifest["gen"] = gen
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path())  # the publish point
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("_committed.v") and name.endswith(".json"):
                    try:
                        os.remove(os.path.join(self.path, name))
                    except OSError:
                        pass
        vtmp = self._version_path(gen) + ".tmp"
        with open(vtmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(vtmp, self._version_path(gen))
        # VACUUM phase, strictly AFTER the publish point so a crash
        # anywhere above leaves the previous manifest fully readable:
        # an overwrite unpublishes the prior manifest's files, so
        # delete them (directory readers would otherwise see ghost
        # rows forever), and sweep _staging of parts abandoned by
        # earlier failed/aborted jobs. Single-writer contract, like
        # the reference's CSV stores (run_full_pipeline.py:150-165).
        if self.overwrite and prev is not None:
            _delete_unreferenced(
                self.path, prev.get("files", []), set(manifest["files"])
            )
        _sweep_staging(self.path)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        # tasks that failed before returning a commit message leave
        # uuid-named parts behind; they are unreferenced, so sweep now
        _sweep_staging(self.path)

    def _manifest_path(self) -> str:
        import os

        return os.path.join(self.path, "_committed.json")

    def _version_path(self, gen: int) -> str:
        import os

        return os.path.join(self.path, f"_committed.v{gen}.json")


def _delete_unreferenced(path: str, candidates, keep: set) -> None:
    """Best-effort removal of published part files that no longer
    appear in the live manifest (post-publish VACUUM)."""
    import os

    for name in candidates:
        if name not in keep:
            try:
                os.remove(os.path.join(path, name))
            except OSError:
                pass


def _sweep_staging(path: str) -> None:
    """Remove leftover parts in ``_staging`` — by the time the driver
    runs commit()/abort(), every part THIS job published has already
    been moved out, so anything remaining is an orphan from a task or
    job that died mid-write."""
    import os

    staging = os.path.join(path, "_staging")
    if not os.path.isdir(staging):
        return
    for name in os.listdir(staging):
        if name.endswith(".jsonl"):
            try:
                os.remove(os.path.join(staging, name))
            except OSError:
                pass


class JsonlAtomicSource(DataSource):
    """``df.write.format("jsonl_atomic").mode(...).save(path)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_atomic"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlAtomicWriter:
        return JsonlAtomicWriter(self.options, overwrite)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> "JsonlAtomicStreamWriter":
        return JsonlAtomicStreamWriter(self.options)


def read_jsonl_atomic(spark, path: str, version: int | None = None):
    """Read back ONLY the committed files (manifest-resolved): staged
    or orphaned part files are invisible, exactly like a table-format
    log reader.

    ``version=K`` time-travels to the table as of its K-th commit
    (1-based), resolving the immutable ``_committed.v{{K}}.json``
    generation snapshot instead of the live manifest. Append
    generations never delete files, so every historical version stays
    readable; an overwrite vacuums and resets the history (its own
    commit becomes v1)."""
    import os

    name = "_committed.json" if version is None else f"_committed.v{version}.json"
    manifest_file = os.path.join(path, name)
    if version is not None and not os.path.exists(manifest_file):
        raise FileNotFoundError(
            f"jsonl_atomic: no committed generation v{version} at {path}"
        )
    with open(manifest_file) as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f) for f in manifest["files"]]
    if not files:
        return spark.createDataFrame([], "dummy string").limit(0)
    return spark.read.json(files)


def register_jsonl_atomic(spark) -> None:
    spark.dataSource.register(JsonlAtomicSource)


class JsonlAtomicStreamWriter(DataSourceStreamWriter):
    """Streaming half of the sink: same staging + manifest mechanics,
    one commit per micro-batch. The manifest keys committed files by
    epoch, so a batch that is REPLAYED after a failure (foreachBatch-
    style at-least-once delivery) overwrites its own epoch entry
    instead of double-appending — idempotent re-commit, which is what
    upgrades the stream's delivery to effectively exactly-once."""

    def __init__(self, options: dict) -> None:
        self.inner = JsonlAtomicWriter(options, overwrite=False)
        self.path = self.inner.path

    def write(self, iterator) -> "StagedFile":
        return self.inner.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        import os

        files, total = [], 0
        for m in messages:
            if m is None or m.rows == 0:
                if m is not None:
                    os.remove(m.path)
                continue
            final = os.path.join(self.path, os.path.basename(m.path))
            os.replace(m.path, final)
            files.append(os.path.basename(final))
            total += m.rows
        mp = os.path.join(self.path, "_committed.json")
        manifest = {"epochs": {}}
        if os.path.exists(mp):
            with open(mp) as fh:
                manifest = json.load(fh)
            if "epochs" not in manifest:  # batch-writer manifest reuse
                manifest = {
                    "epochs": {"batch": manifest["files"]},
                    # seed the per-epoch row ledger too, or the batch
                    # rows vanish from every later stream commit's sum
                    "epoch_rows": {"batch": manifest.get("rows", 0)},
                }
        # replayed epoch REPLACES its entry — never double-appends
        # (files AND row counts are keyed per epoch, then re-derived)
        replaced = manifest["epochs"].get(str(batchId), [])
        manifest["epochs"][str(batchId)] = sorted(files)
        epoch_rows = manifest.get("epoch_rows", {})
        epoch_rows[str(batchId)] = total
        manifest["epoch_rows"] = epoch_rows
        manifest["files"] = sorted(
            f for fs in manifest["epochs"].values() for f in fs
        )
        manifest["rows"] = sum(epoch_rows.values())
        tmp = mp + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, mp)
        # post-publish VACUUM: a replayed epoch's superseded files are
        # now unreferenced — delete them, and sweep abandoned staging
        if replaced:
            _delete_unreferenced(self.path, replaced, set(manifest["files"]))
        _sweep_staging(self.path)
        # fault-injection seam (tests only): hold the return to the
        # engine AFTER the manifest publish — the engine cannot write
        # its commits/<batch> entry until commit() returns, so a test
        # killing the process inside this sleep lands exactly in the
        # "sink committed, engine uncommitted" crash window whose
        # replay must hit the epoch-REPLACE path above.
        delay_ms = os.environ.get("JSONL_ATOMIC_POST_COMMIT_DELAY_MS", "")
        if delay_ms:
            import time

            time.sleep(int(delay_ms) / 1000.0)

    def abort(self, messages, batchId: int) -> None:
        self.inner.abort(messages)

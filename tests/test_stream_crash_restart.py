"""End-to-end crash-restart exactly-once proof for the streaming
quartet: ``rest_pages`` → ``jsonl_atomic``.

The stream reader's contract (``sources.py`` RestPagesStreamReader
docstring) is at-least-once across CRASH restarts — the one
uncommitted tail batch replays in full after a kill that lands between
the engine's offset write and its commit. The jsonl_atomic stream
sink keys its manifest per epoch, so a replayed batch REPLACES its
epoch entry instead of double-appending. This test proves the two
compose into effective exactly-once across a real ``SIGKILL``:

1. run the stream in a subprocess, slowed so every micro-batch's
   offset-written → committed window is wide;
2. from the parent, poll the checkpoint and SIGKILL the child the
   moment ``offsets/N`` exists without ``commits/N`` for some N ≥ 1
   (batch 0 must commit first, so the restart also proves committed
   pages are NOT re-delivered) — no aborts, no cleanup, the exact
   crash window the reader docstring names;
3. restart an identical query on the same checkpoint in a second
   subprocess and let it drain the feed;
4. assert the manifest holds every (page, agency_id) exactly once.

Protocol-level unit tests (clean stops, probe/regression spans,
epoch re-commit idempotence) live in ``test_sources_api.py``; this is
the process-kill integration they could not cover.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pytest

CHILD = os.path.join(os.path.dirname(__file__), "crash_restart_child.py")

PAGES = 6
PAGE_SIZE = 8
PAGES_PER_BATCH = 2
SLEEP_MS = 60  # per-row UDF sleep: ≥ 8×60 = 480 ms per task/batch
EXPECTED = PAGES * PAGE_SIZE


def _spawn(
    ckpt: str, target: str, timeout_s: int, log_path: str
) -> subprocess.Popen:
    # child output goes to a FILE, not a pipe: the parent polls without
    # draining, and a chatty Spark boot can fill a 64 KB pipe buffer
    # and deadlock the child before the kill window appears (r9 review)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(CHILD)))
    env = dict(os.environ)
    env.pop("REST_PAGES_TRACE", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    with open(log_path, "wb") as logf:
        return subprocess.Popen(
            [
                sys.executable,
                CHILD,
                ckpt,
                target,
                str(PAGES),
                str(PAGE_SIZE),
                str(PAGES_PER_BATCH),
                str(SLEEP_MS),
                str(EXPECTED),
                str(timeout_s),
            ],
            env=env,
            stdout=logf,
            stderr=subprocess.STDOUT,
            cwd=repo_root,
        )


def _batch_ids(d: str) -> set[int]:
    if not os.path.isdir(d):
        return set()
    return {int(f) for f in os.listdir(d) if f.isdigit()}


def test_sigkill_mid_batch_then_restart_is_exactly_once(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "sink")
    offsets_dir = os.path.join(ckpt, "offsets")
    commits_dir = os.path.join(ckpt, "commits")

    # --- phase 1: run and SIGKILL inside the offset->commit window ----
    log1 = str(tmp_path / "child1.log")
    child = _spawn(ckpt, target, timeout_s=300, log_path=log1)
    kill_batch = None
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            if child.poll() is not None:
                out = open(log1, errors="replace").read()
                pytest.fail(
                    f"child exited rc={child.returncode} before the kill "
                    f"window was found:\n{out[-2000:]}"
                )
            pending = _batch_ids(offsets_dir) - _batch_ids(commits_dir)
            # N >= 1: batch 0 must already be committed, so the restart
            # also exercises the no-redeliver floor for committed pages
            eligible = {n for n in pending if n >= 1}
            if eligible:
                kill_batch = min(eligible)
                os.kill(child.pid, signal.SIGKILL)
                break
            time.sleep(0.01)
        else:
            child.kill()
            pytest.fail("offset-written/uncommitted window never observed")
    finally:
        child.wait(timeout=30)

    # the kill landed in the named window: the batch's offset is logged,
    # its commit is not, and SIGKILL means no abort/cleanup ever ran
    assert kill_batch is not None and kill_batch >= 1
    assert kill_batch in _batch_ids(offsets_dir)
    assert kill_batch not in _batch_ids(commits_dir), (
        "commit raced the kill — widen SLEEP_MS"
    )
    mp = os.path.join(target, "_committed.json")
    rows_at_crash = 0
    if os.path.exists(mp):
        rows_at_crash = json.load(open(mp)).get("rows", 0)
    assert rows_at_crash < EXPECTED, "feed finished before the crash"

    # --- phase 2: restart the identical query on the same checkpoint --
    log2 = str(tmp_path / "child2.log")
    child2 = _spawn(ckpt, target, timeout_s=240, log_path=log2)
    child2.wait(timeout=300)
    out2 = open(log2, errors="replace").read()
    assert child2.returncode == 0, (
        f"restarted child rc={child2.returncode}:\n{out2[-2000:]}"
    )

    # --- exactly-once: every page exactly once, no dupes, no losses ---
    manifest = json.load(open(mp))
    assert manifest["rows"] == EXPECTED
    seen = []
    for name in manifest["files"]:
        with open(os.path.join(target, name)) as fh:
            for line in fh:
                if line.strip():
                    r = json.loads(line)
                    seen.append((r["page"], r["agency_id"]))
    assert len(seen) == EXPECTED
    assert len(set(seen)) == EXPECTED, "duplicate rows after replay"
    by_page = {}
    for page, _ in seen:
        by_page[page] = by_page.get(page, 0) + 1
    assert by_page == {p: PAGE_SIZE for p in range(PAGES)}

    # the replayed epoch replaced its manifest entry (never appended):
    # every epoch's ledger matches its files' actual row counts
    for epoch, files in manifest["epochs"].items():
        actual = 0
        for name in files:
            with open(os.path.join(target, name)) as fh:
                actual += sum(1 for ln in fh if ln.strip())
        assert manifest["epoch_rows"][epoch] == actual


@pytest.mark.heavytier
def test_sigkill_after_sink_commit_before_engine_commit(tmp_path):
    """The NARROWER crash window: the jsonl_atomic manifest already
    holds epoch N (sink commit published) but the engine's commits/N
    is not yet written — forced open via the sink's post-commit
    fault-injection delay, then a real SIGKILL inside it. On restart
    the engine must replay batch N and the sink's epoch-REPLACE
    re-commit must leave every page exactly once (the idempotence the
    unit tests prove in-process, here across a process kill)."""
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "sink")
    offsets_dir = os.path.join(ckpt, "offsets")
    commits_dir = os.path.join(ckpt, "commits")
    mp = os.path.join(target, "_committed.json")

    os.environ["JSONL_ATOMIC_POST_COMMIT_DELAY_MS"] = "1500"
    try:
        log1 = str(tmp_path / "child1.log")
        child = _spawn(ckpt, target, timeout_s=300, log_path=log1)
        kill_epoch = None
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                if child.poll() is not None:
                    out = open(log1, errors="replace").read()
                    pytest.fail(
                        f"child exited rc={child.returncode} early:\n"
                        f"{out[-2000:]}"
                    )
                try:
                    epochs = {
                        int(e)
                        for e in json.load(open(mp))
                        .get("epochs", {})
                        .keys()
                        if e.isdigit()
                    }
                except (OSError, ValueError):
                    epochs = set()
                pending = {
                    n
                    for n in epochs - _batch_ids(commits_dir)
                    if n >= 1
                }
                if pending:
                    kill_epoch = min(pending)
                    os.kill(child.pid, signal.SIGKILL)
                    break
                time.sleep(0.01)
            else:
                child.kill()
                pytest.fail("sink-committed/engine-uncommitted window "
                            "never observed")
        finally:
            child.wait(timeout=30)
    finally:
        del os.environ["JSONL_ATOMIC_POST_COMMIT_DELAY_MS"]

    # the kill landed in the narrow window: epoch in the manifest,
    # batch absent from the engine commit log
    assert kill_epoch is not None and kill_epoch >= 1
    assert kill_epoch in _batch_ids(offsets_dir)
    assert kill_epoch not in _batch_ids(commits_dir)
    rows_at_crash = json.load(open(mp)).get("rows", 0)
    assert rows_at_crash > 0

    # restart WITHOUT the delay; the engine replays batch kill_epoch
    log2 = str(tmp_path / "child2.log")
    child2 = _spawn(ckpt, target, timeout_s=240, log_path=log2)
    child2.wait(timeout=300)
    out2 = open(log2, errors="replace").read()
    assert child2.returncode == 0, out2[-2000:]

    manifest = json.load(open(mp))
    assert manifest["rows"] == EXPECTED
    seen = []
    for name in manifest["files"]:
        with open(os.path.join(target, name)) as fh:
            seen += [
                (json.loads(ln)["page"], json.loads(ln)["agency_id"])
                for ln in fh
                if ln.strip()
            ]
    assert len(seen) == len(set(seen)) == EXPECTED

"""Streaming twin of the nightly dedup fold: correctness vs the batch
fold, and crash-restart exactly-once across a real SIGKILL.

The reference's forever-loop (``run_full_pipeline.py:202-431``) crashes
and restarts freely; its contract is that re-processing a batch leaves
the same state as processing it once. The streaming form inherits the
crash window from Structured Streaming's checkpoint protocol: a kill
between ``offsets/N`` and ``commits/N`` re-delivers batch N — same
files, same batch_id — on restart, possibly on top of PARTIALLY
committed state (the fold commits three tables in sequence). The test
kills inside that window and asserts the drained state is
row-identical to a clean sequential batch fold of the same nights.

Value-level correctness of the fold body itself (stream == batch ==
DuckDB from-scratch clustering) is pinned by the oracle-checked
``e12c_stream_dedup_fold`` registry query; these tests cover the
process-kill protocol the oracle can't.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

CHILD = os.path.join(os.path.dirname(__file__), "dedup_fold_crash_child.py")

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def _text(seed: int, n_words: int = 30) -> str:
    # deterministic pseudo-random sentence with a doc-unique leading
    # token: seeds congruent mod len(_WORDS) would otherwise generate
    # IDENTICAL word sequences (the seed term cancels), silently
    # turning unrelated docs into exact dups. 30 words so a one-word
    # near-dup keeps true 3-shingle Jaccard >= 0.8 (26/32).
    body = " ".join(
        _WORDS[(seed * 7919 + i * i * 31 + i) % 9973 % len(_WORDS)]
        for i in range(n_words)
    )
    return f"doc{seed} {body}"


def _near(text: str, at: int) -> str:
    w = text.split()
    w[at] = "zulu"
    return " ".join(w)


def _nights() -> list[list[tuple[int, str]]]:
    """Three nights with intra-night near-dups, cross-night near-dups,
    and a cross-night EXACT dup (screened out by the digest state)."""
    n1 = [(i, _text(i)) for i in range(1, 13)]
    n1.append((13, _near(_text(1), 3)))          # near-dup of doc 1
    n2 = [(i, _text(i)) for i in range(21, 33)]
    n2.append((33, _text(1)))                    # EXACT dup of doc 1
    n2.append((34, _near(_text(1), 7)))          # near-dup of docs 1/13
    n2.append((35, _near(_text(21), 2)))         # near-dup of doc 21
    n3 = [(i, _text(i)) for i in range(41, 53)]
    n3.append((53, _near(_text(1), 7)))          # EXACT dup of doc 34
    n3.append((54, _near(_text(41), 5)))         # near-dup of doc 41
    return [n1, n2, n3]


def _write_landing(spark, landing: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(landing)
    now = time.time()
    for i, night in enumerate(_nights()):
        path = os.path.join(landing, f"night{i + 1}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        [d for d, _ in night], type=pa.int64()
                    ),
                    "text": [t for _, t in night],
                }
            ),
            path,
        )
        t = now - 60 + 20 * i
        os.utime(path, (t, t))


def _clean_batch_fold(spark, tmp: str):
    """The oracle twin: the SAME nights folded sequentially with the
    plain batch fold into a fresh state."""
    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        fold_dedup_batch,
        open_dedup_state,
    )

    state = open_dedup_state(spark, tmp, num_buckets=None)
    for night in _nights():
        batch = spark.createDataFrame(night, "doc_id long, text string")
        fold_dedup_batch(batch, *state)
    return state


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def _spawn(
    landing: str, state_root: str, ckpt: str, log_path: str
) -> subprocess.Popen:
    # child output goes to a FILE, not a pipe: the parent polls without
    # draining, and a chatty Spark boot can fill a 64 KB pipe buffer
    # and deadlock the child before the kill window appears (r9 review)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(CHILD)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    with open(log_path, "wb") as logf:
        return subprocess.Popen(
            [sys.executable, CHILD, landing, state_root, ckpt],
            env=env,
            stdout=logf,
            stderr=subprocess.STDOUT,
            cwd=repo_root,
        )


def _batch_ids(d: str) -> set[int]:
    if not os.path.isdir(d):
        return set()
    return {int(f) for f in os.listdir(d) if f.isdigit()}


def _assert_state_equals_clean(spark, state_root: str, tmp_path) -> None:
    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        open_dedup_state,
    )

    digests, clusters, sigs = open_dedup_state(
        spark, state_root, num_buckets=None
    )
    cd, cc, cs = _clean_batch_fold(spark, str(tmp_path / "clean_state"))
    assert _rows(clusters.read(), ["doc_id", "cluster_id"]) == _rows(
        cc.read(), ["doc_id", "cluster_id"]
    )
    assert _rows(digests.read(), ["content_sha", "owner_id"]) == _rows(
        cd.read(), ["content_sha", "owner_id"]
    )
    assert _rows(sigs.read(), ["doc_id"]) == _rows(cs.read(), ["doc_id"])


@pytest.mark.heavytier
def test_stream_fold_equals_batch_fold(spark, tmp_path):
    """No crash: the availableNow stream over three landing files must
    land exactly the clean sequential batch fold's state, and a second
    run on the same checkpoint (no new files) must be a no-op."""
    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        stream_dedup_fold,
    )

    landing = str(tmp_path / "landing")
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_landing(spark, landing)
    stream_dedup_fold(
        spark, landing, state_root, ckpt, num_buckets=None
    )
    _assert_state_equals_clean(spark, state_root, tmp_path)
    # idempotent re-run: checkpoint remembers the processed files
    stream_dedup_fold(
        spark, landing, state_root, ckpt, num_buckets=None
    )
    _assert_state_equals_clean(spark, state_root, tmp_path)


@pytest.mark.heavytier
def test_sigkill_mid_fold_then_restart_state_is_exactly_once(
    spark, tmp_path
):
    """SIGKILL the stream inside a fold (offsets/N written, commits/N
    not), restart on the same checkpoint, drain — the final state must
    equal the clean batch fold: the replayed batch folded exactly once
    on top of whatever partial table commits the crash left behind."""
    landing = str(tmp_path / "landing")
    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    offsets_dir = os.path.join(ckpt, "offsets")
    commits_dir = os.path.join(ckpt, "commits")
    _write_landing(spark, landing)

    # --- phase 1: run and SIGKILL inside the offset->commit window ---
    log1 = str(tmp_path / "child1.log")
    child = _spawn(landing, state_root, ckpt, log1)
    kill_batch = None
    deadline = time.time() + 240
    try:
        while time.time() < deadline:
            if child.poll() is not None:
                out = open(log1, errors="replace").read()
                pytest.fail(
                    f"child exited rc={child.returncode} before the kill "
                    f"window was found:\n{out[-2000:]}"
                )
            # N >= 1: batch 0 must already be committed, so the restart
            # also proves committed nights are not re-folded from zero
            pending = {
                n
                for n in _batch_ids(offsets_dir) - _batch_ids(commits_dir)
                if n >= 1
            }
            if pending:
                kill_batch = min(pending)
                # let the fold get INTO its state commits sometimes:
                # a short random-free stagger widens coverage across
                # the none/clusters/clusters+digests partial states
                time.sleep(0.5 * (kill_batch % 3))
                os.kill(child.pid, signal.SIGKILL)
                break
            time.sleep(0.05)
        assert kill_batch is not None, "no kill window found in 240s"
        child.wait(timeout=30)
    finally:
        if child.poll() is None:
            child.kill()

    # --- phase 2: restart on the same checkpoint and drain -----------
    log2 = str(tmp_path / "child2.log")
    child2 = _spawn(landing, state_root, ckpt, log2)
    child2.wait(timeout=480)
    out = open(log2, errors="replace").read()
    assert child2.returncode == 0, out[-2000:]
    assert "DRAINED" in out

    # every batch now committed
    assert _batch_ids(commits_dir) >= _batch_ids(offsets_dir)

    # --- the exactly-once assertion -----------------------------------
    _assert_state_equals_clean(spark, state_root, tmp_path)


def _inventory(data_dir: str) -> dict[str, tuple]:
    """relpath -> (size, mtime_ns, md5) for every data file."""
    import hashlib

    inv = {}
    for root, _dirs, files in os.walk(data_dir):
        for fn in files:
            p = os.path.join(root, fn)
            st = os.stat(p)
            with open(p, "rb") as fh:
                digest = hashlib.md5(fh.read()).hexdigest()
            inv[os.path.relpath(p, data_dir)] = (
                st.st_size,
                st.st_mtime_ns,
                digest,
            )
    return inv


@pytest.mark.heavytier
def test_untouched_buckets_byte_identical_across_fold(spark, tmp_path):
    """The r10 touched-component commit contract: folding a night that
    touches none of the saved components must leave every cluster-map
    bucket holding only untouched docs BYTE-IDENTICAL on disk (same
    files, sizes, mtimes, content) — the nightly commit is proportional
    to the batch's blast radius, not the corpus. Night 3 of the shared
    fixture touches only its own docs (53's exact-dup screen drops the
    one cross-night link), so its write set is exactly the buckets its
    surviving ids hash into."""
    from pyspark.sql import functions as F

    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        fold_dedup_batch,
        open_dedup_state,
    )

    n_buckets = 64
    nights = _nights()
    state = open_dedup_state(
        spark, str(tmp_path / "state"), num_buckets=n_buckets
    )
    for night in nights[:2]:
        fold_dedup_batch(
            spark.createDataFrame(night, "doc_id long, text string"),
            *state,
        )
    clusters_data = os.path.join(str(tmp_path / "state"), "clusters", "data")
    before = _inventory(clusters_data)

    fold_dedup_batch(
        spark.createDataFrame(nights[2], "doc_id long, text string"),
        *state,
    )
    after = _inventory(clusters_data)

    # expected touched docs: night-3 survivors (53 is an exact dup of
    # 34, screened out) — none of them joins a saved component, so the
    # write set is exactly their buckets
    survivors = [d for d, _ in nights[2] if d != 53]
    touched_buckets = {
        r[0]
        for r in spark.createDataFrame(
            [(d,) for d in survivors], "doc_id long"
        )
        .select(F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))
        .collect()
    }
    def bucket_of(rel: str) -> int | None:
        head = rel.split(os.sep)[0]
        return (
            int(head.split("=")[1]) if head.startswith("_bucket=") else None
        )

    all_buckets = {
        b for b in (bucket_of(rel) for rel in before) if b is not None
    }
    untouched = all_buckets - touched_buckets
    assert untouched, "fixture degenerate: every bucket touched"
    for rel, meta in before.items():
        b = bucket_of(rel)
        if b is not None and b in untouched:
            assert after.get(rel) == meta, (
                f"untouched bucket {b} was rewritten: {rel}"
            )

    # and the map is still semantically right: equal to the clean
    # versioned-layout fold of the same nights
    cd, cc, cs = _clean_batch_fold(spark, str(tmp_path / "clean"))
    assert _rows(state[1].read(), ["doc_id", "cluster_id"]) == _rows(
        cc.read(), ["doc_id", "cluster_id"]
    )


def test_empty_but_present_state_table_trips_guard(spark, tmp_path):
    """An existing-but-EMPTY digest or signature table beside a cluster
    map that knows foreign docs is the same corruption as a missing
    table (one crash-shape away) and must refuse to fold (VERDICT r9
    low #3)."""
    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        fold_dedup_batch,
        open_dedup_state,
    )

    nights = _nights()
    state = open_dedup_state(
        spark, str(tmp_path / "state"), num_buckets=None
    )
    fold_dedup_batch(
        spark.createDataFrame(nights[0], "doc_id long, text string"),
        *state,
    )
    digests, clusters, sigs = state
    # corrupt: truncate the digest table to zero rows (an empty frame
    # built fresh — limit(0) over the table's own files would make the
    # overwrite read what it is deleting)
    digests.write_initial(
        spark.createDataFrame([], "content_sha string, owner_id long")
    )
    assert digests.read() is not None and not digests.read().take(1)
    with pytest.raises(ValueError, match="missing or empty"):
        fold_dedup_batch(
            spark.createDataFrame(nights[1], "doc_id long, text string"),
            *state,
        )


def test_foreign_state_rows_without_cluster_map_trips_guard(
    spark, tmp_path
):
    """The converse guard (ADVICE r9): digest/signature state holding
    rows owned OUTSIDE the batch while the cluster map is absent means
    a fold would silently drop those prior docs from the committed
    map — refuse instead."""
    import shutil

    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        fold_dedup_batch,
        open_dedup_state,
    )

    nights = _nights()
    state = open_dedup_state(
        spark, str(tmp_path / "state"), num_buckets=None
    )
    fold_dedup_batch(
        spark.createDataFrame(nights[0], "doc_id long, text string"),
        *state,
    )
    digests, clusters, sigs = state
    shutil.rmtree(clusters.path)
    assert clusters.read() is None
    with pytest.raises(ValueError, match="cluster map is absent"):
        fold_dedup_batch(
            spark.createDataFrame(nights[1], "doc_id long, text string"),
            *state,
        )


def test_null_text_fold_and_replay_pins_digest_state(spark, tmp_path):
    """Null-text contract (VERDICT r9 low #4): null text is pinned to
    '' before hashing, so null-text docs are exact dups of each other
    (one digest row, min-id owner) and a REPLAY of the same batch adds
    no duplicate digest rows — the un-pinned form accumulated
    NULL-key digest rows on every re-fold because sha2(NULL) is NULL
    and never equi-matches in the keyed merge."""
    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        fold_dedup_batch,
        open_dedup_state,
    )

    state = open_dedup_state(
        spark, str(tmp_path / "state"), num_buckets=None
    )
    batch = spark.createDataFrame(
        [(1, _text(1)), (2, None), (3, None)], "doc_id long, text string"
    )
    fold_dedup_batch(batch, *state)
    digests, clusters, sigs = state

    def snap():
        return (
            _rows(digests.read(), ["content_sha", "owner_id"]),
            _rows(clusters.read(), ["doc_id", "cluster_id"]),
        )

    first = snap()
    dig, cl = first
    # no NULL digest keys; the two null-text docs share ONE digest row
    # owned by the min id (doc 3 stays in the map — an IN-batch exact
    # dup is kept, same as the batch flagships' oracle semantics)
    assert all(sha is not None for sha, _ in dig)
    assert len(dig) == 2  # doc1's sha + the empty-text sha
    assert (2 in {o for _, o in dig})
    assert {d for d, _ in cl} == {1, 2, 3}
    # replay: byte-identical state, no accumulated rows
    fold_dedup_batch(batch, *state)
    assert snap() == first


class _CrashAfter(Exception):
    pass


@pytest.mark.heavytier
def test_partial_commit_replay_idempotent(spark, tmp_path):
    """Deterministic twin of the SIGKILL test: the fold commits THREE
    tables in sequence (clusters -> digests -> signatures), so a crash
    leaves one of four states. Enumerate ALL of them — crash before any
    commit, after 1, after 2, and the no-crash control — re-fold the
    same batch, finish the remaining nights, and require the final
    state to equal the clean sequential fold. The SIGKILL test samples
    one kill point per run; this pins every partial-commit state."""
    from mcyj_datapipeline_spark.streaming.dedup_fold import (
        fold_dedup_batch,
        open_dedup_state,
    )

    nights = _nights()

    def night_df(i):
        return spark.createDataFrame(nights[i], "doc_id long, text string")

    cd, cc, cs = _clean_batch_fold(spark, str(tmp_path / "clean"))

    for crash_after in (0, 1, 2, 3):
        state = open_dedup_state(
            spark, str(tmp_path / f"s{crash_after}"), num_buckets=None
        )
        fold_dedup_batch(night_df(0), *state)

        # wrap the commit sequence: raise once `crash_after` table
        # commits have gone through (0 = before any commit)
        commits = {"n": 0}
        originals = [t.update for t in state]

        def crashing(orig):
            def _u(updates, columns):
                if commits["n"] >= crash_after:
                    raise _CrashAfter()
                commits["n"] += 1
                return orig(updates, columns)

            return _u

        for t, orig in zip(state, originals):
            t.update = crashing(orig)
        try:
            fold_dedup_batch(night_df(1), *state)
            assert crash_after >= 3, "expected a crash"
        except _CrashAfter:
            assert crash_after < 3
        finally:
            for t, orig in zip(state, originals):
                t.update = orig

        # the replay (same batch, same state) and the remaining night
        fold_dedup_batch(night_df(1), *state)
        fold_dedup_batch(night_df(2), *state)

        assert _rows(state[1].read(), ["doc_id", "cluster_id"]) == _rows(
            cc.read(), ["doc_id", "cluster_id"]
        ), f"clusters diverged at crash_after={crash_after}"
        assert _rows(
            state[0].read(), ["content_sha", "owner_id"]
        ) == _rows(cd.read(), ["content_sha", "owner_id"]), (
            f"digests diverged at crash_after={crash_after}"
        )
        assert _rows(state[2].read(), ["doc_id"]) == _rows(
            cs.read(), ["doc_id"]
        ), f"signatures diverged at crash_after={crash_after}"

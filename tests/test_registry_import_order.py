"""Registry import-order regression (r9): a direct
``import registry_batchN`` — what test modules do to reach helper
functions — must never poison the process registry.

Before r9 the batch-import chain sat at registry.py's bottom: a direct
batch import re-entered registry.py mid-initialization, the chain
skipped the partially-initialized module, and registry_batch37's
import-time oracle composition KeyError'd — after which the process's
registry was permanently partial (reproduced with
``pytest tests/test_batch33.py tests/test_sequential.py``). The chain
now lives in registry_all.py, loaded lazily by queries()/oracle_sql(),
and batch37 imports its registrar dependencies explicitly.

Each case runs in a FRESH interpreter (the failure mode is an
import-order property of a process, not of this test session). No
Spark session is needed — the registry imports are pure.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the historically dangerous entry points: modules that compose oracle
# SQL from _REGISTRY at import time, plus the pair that reproduced the
# original poisoning, plus a plain module as control
FIRST_IMPORTS = [
    "mcyj_datapipeline_spark.registry_batch37",  # composes from 4 modules
    "mcyj_datapipeline_spark.registry_batch33",  # the original repro
    "mcyj_datapipeline_spark.registry_batch21",
    "mcyj_datapipeline_spark.registry_batch5",
    "mcyj_datapipeline_spark.registry_batch3",
    "mcyj_datapipeline_spark.registry_batch13",
]


@pytest.mark.parametrize("first", FIRST_IMPORTS)
def test_direct_batch_import_then_full_registry(first):
    code = (
        f"import {first}\n"
        "from mcyj_datapipeline_spark import registry\n"
        "q = registry.queries(); o = registry.oracle_sql()\n"
        "assert len(q) >= 343, len(q)\n"
        "assert 'ml_psi_drift' in q and 'e18_corpus_health_scorecard' in q\n"
        "assert 'e18_corpus_health_scorecard' in o\n"
        "print('OK', len(q))\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_raw_registry_reads_always_pair_with_load_all():
    """Lint sweep: every file outside the registry modules that reads
    ``_REGISTRY`` directly must also reference ``load_all`` — the lazy
    registry split (r9) means a raw read without it silently sees a
    partial registry. (A self-loading dict was tried and reverted: the
    batch modules themselves read the dict mid-import, and triggering
    the import chain from inside a partially-initialized module is the
    exact circular failure the split removed.)"""
    import re

    offenders = []
    for root, _dirs, files in os.walk(REPO):
        if any(
            part in root
            for part in (".git", "spark-warehouse", "testdata", "evidence")
        ):
            continue
        for fn in files:
            if not (fn.endswith(".py") or fn.endswith(".sh")):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, REPO)
            # Only the registry modules THEMSELVES manage the dict;
            # the rest of the package (plans/, operators/, streaming/)
            # must pair raw reads with load_all like any other caller
            # (ADVICE r9: the old whole-package exemption would let a
            # partial-registry read slide in unlinted).
            base = os.path.basename(rel)
            is_registry_module = rel.startswith(
                "mcyj_datapipeline_spark" + os.sep
            ) and (
                base in ("registry.py", "registry_all.py")
                or re.fullmatch(r"registry_batch\w*\.py", base)
            )
            if is_registry_module or rel in (
                "tests/test_registry_import_order.py",
            ):
                continue  # registry internals manage the dict itself
            text = open(path, errors="replace").read()
            if re.search(r"_REGISTRY\b", text) and "load_all" not in text:
                offenders.append(rel)
    assert not offenders, (
        f"raw _REGISTRY reads without load_all(): {offenders}"
    )

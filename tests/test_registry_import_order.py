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

"""Imports every ``registry_batchN`` module so its ``@register``
decorators run — the single place the full query registry is
materialized.

Lives OUTSIDE ``registry.py`` on purpose (r9): when the import chain
sat at registry.py's bottom, any direct ``import registry_batchN``
from a test re-entered registry.py mid-initialization, the chain
skipped the partially-initialized module N, and every later module
composing oracle SQL from ``_REGISTRY`` (batch37's scorecard) hit a
KeyError — poisoning the process's registry for all subsequent
imports. With the chain here, ``from registry import register`` is
cycle-free and :func:`registry.load_all` triggers this module exactly
once, on first ``queries()`` / ``oracle_sql()`` call.

Order matters only for import-time oracle composition: a module
reading ``_REGISTRY[name]`` at import must come after ``name``'s
registrar (batch37 also imports its registrars explicitly, so it is
safe under direct import too).
"""

from mcyj_datapipeline_spark import registry_batch3  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch4  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch5  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch6  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch7  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch8  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch9  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch10  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch11  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch12  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch13  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch14  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch15  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch16  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch17  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch18  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch19  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch20  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch21  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch22  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch23  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch24  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch25  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch26  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch27  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch28  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch29  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch30  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch31  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch32  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch33  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch34  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch35  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch36  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch37  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch38  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch39  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch40  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch41  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch42  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch43  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch44  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch45  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch46  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch47  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch48  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch49  # noqa: E402,F401
from mcyj_datapipeline_spark import registry_batch50  # noqa: E402,F401

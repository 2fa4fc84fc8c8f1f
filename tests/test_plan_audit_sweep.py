"""Registry-wide plan-shape sweep: the mechanical enforcement of
PLANS.md. Every registered query's executed plan must be free of
CartesianProduct, and Python/Arrow stages may appear ONLY in the
documented set (partial top-k consumers, multimodal codecs).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

# queries whose plans legitimately contain an Arrow/Python stage:
# derived from the registry itself — each query declares (and thereby
# documents) its Python stages via register(python_stages="...").
# A new query carrying an undeclared Python stage fails this sweep;
# the declaration is the same text tools/plan_audit.py prints, so the
# test and PLANS.md cannot drift apart.
from corrie_spark.queries.registry import all_python_stage_notes

_PYTHON_OK = set(all_python_stage_notes())


@pytest.mark.slow
def test_registry_wide_plan_sweep(spark):
    from plan_audit import audit

    from corrie_spark.queries.registry import all_queries
    from tests.conftest import SF_SMOKE

    offenders_cartesian = []
    offenders_python = []
    for name, fn in sorted(all_queries().items()):
        df = fn(spark, SF_SMOKE)
        a = audit(df._jdf.queryExecution().executedPlan().toString())
        if a["cartesian"]:
            offenders_cartesian.append(name)
        if a["python"] and name not in _PYTHON_OK:
            offenders_python.append(name)
    assert offenders_cartesian == []
    assert offenders_python == []

"""The whole-surface plan dragnet (scripts/audit_plans.py) as a CI
test (round-3 advice #10): a refactor that degrades ANY declared
query's physical plan — cartesian degeneration, a Python UDF node in
a JVM path, an exchange explosion, a cloned filter tree — fails here
even when nobody remembers to run the script standalone. Marked slow
(one explain per declared query); skip locally with -m 'not slow'.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "scripts")
)

from audit_plans import audit, audit_schema  # noqa: E402

from data_lake_project_spark.plans import explain_str
from data_lake_project_spark.queries import QUERIES

from conftest import SF_DIR


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_plan_has_no_scale_red_flags(name, spark, request):
    df = QUERIES[name](spark, SF_DIR)
    plan = explain_str(df)
    flags = audit(name, plan) + audit_schema(name, df.schema)
    assert not flags, f"{name}: {', '.join(flags)}\n{plan[:4000]}"

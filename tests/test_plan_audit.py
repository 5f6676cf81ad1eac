"""CI pin for the plan-audit allowlists (round 9, VERDICT r8 #1).

tools/plan_audit.py enforces that every BroadcastNestedLoopJoin and
SortAggregate in a registry plan is allowlisted with a boundedness
justification — and, since round 9, that every allowlist row is LIVE
(a stale row would silently license a future unbounded operator in
that query). This test runs the same audit over the full registry at
sf0.001 and asserts allowlist == live-set, so drift fails CI rather
than waiting for someone to run the manual tool.

~80 s (builds all 179 plans): the cost of making the tool that caught
the round-8 SortAggregate regression self-checking.
"""

from __future__ import annotations

from tools.plan_audit import BNLJ_ALLOWED, SORTAGG_ALLOWED, audit, evaluate

SF = "/root/testdata/sf0.001"


def test_allowlists_match_live_plan_sets(spark):
    from x17a5_spark.queries import registry

    queries, _ = registry()
    hits, failures = audit(SF, queries)
    assert not failures, failures
    # never-allowlistable operators: hard zero
    assert hits["cartesian"] == [], hits["cartesian"]
    assert hits["py_udf"] == [], hits["py_udf"]
    # allowlist liveness, both directions (the evaluate() policy)
    assert set(hits["bnlj"]) == set(BNLJ_ALLOWED), (
        sorted(set(hits["bnlj"]) ^ set(BNLJ_ALLOWED))
    )
    assert set(hits["sortagg"]) == set(SORTAGG_ALLOWED), (
        sorted(set(hits["sortagg"]) ^ set(SORTAGG_ALLOWED))
    )
    lines, bad = evaluate(hits, failures)
    assert not bad, lines

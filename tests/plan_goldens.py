"""Plan-golden snapshot workflow (reference sqlplannertest parity).

The reference regenerates its checked-in planner snapshots with
`make planner_test_build` (/root/reference/Makefile:15-19,
/root/reference/tests/sqlplannertest/src/bin/apply.rs:158-167) and verifies
them with `make planner_test`. This module is the equivalent for the 23
ported golden cases (tests/test_optimizer.py keeps the plan-SHAPE
assertions; this file pins the full rendered plans):

    python -m tests.plan_goldens            # verify vs tests/goldens/plans.snapshot
    python -m tests.plan_goldens --apply    # regenerate the snapshot

`make planner_test` runs the verify mode via pytest
(test_optimizer.py::test_plan_golden_snapshot); `make planner_test_build`
regenerates. The snapshot records the engine's EXPLAIN output (original +
optimized logical + physical plan) for every golden query over the shared
t1/t2 fixture catalog (reference rules/mod.rs:62-110 rule_test_util).
"""

from __future__ import annotations

import os
import sys

SNAPSHOT = os.path.join(os.path.dirname(__file__), "goldens", "plans.snapshot")

# the 23 reference sqlplannertest cases (tests/planner/*.yml), same SQL as
# the shape assertions in tests/test_optimizer.py
GOLDEN_QUERIES = [
    ("pp1_inner_pushdown_both_sides",
     "select t1.* from t1 inner join t2 on t1.a=t2.b where t2.a > 2 and t1.a > 1"),
    ("pp2_left_join_pushes_left_only",
     "select t1.* from t1 left join t2 on t1.a=t2.b where t2.a > 2 and t1.a > 1"),
    ("pp3_right_join_pushes_right_only",
     "select t1.* from t1 right join t2 on t1.a=t2.b where t2.a > 2 and t1.a > 1"),
    ("pp4_common_filter_into_join_condition",
     "select t1.* from t1 inner join t2 on t1.a=t2.b where t2.a > 2 and t1.a > t2.a"),
    ("pp5_left_join_keeps_mixed_above",
     "select t1.* from t1 left join t2 on t1.a=t2.b where t2.a > 2 and t1.a > t2.a"),
    ("pp6_right_join_mixed",
     "select t1.* from t1 right join t2 on t1.a=t2.b where t1.a > 2 and t1.a > t2.a"),
    ("pp7_subquery_filters_combined",
     "select t.a from (select * from t1 where a > 1) t where t.b > 7"),
    ("lp1_limit_offset_into_scan", "select a from t1 offset 2 limit 1"),
    ("lp2_order_keeps_limit",
     "select t1.a from t1 order by t1.b offset 1 limit 1"),
    ("lp3_left_join_limit_preserved_side",
     "select t1.a from t1 left join t2 on t1.a=t2.b offset 1 limit 1"),
    ("lp4_right_join_limit", "select t1.a from t1 right join t2 on t1.a=t2.b limit 1"),
    ("lp5_offset_only_no_pushdown",
     "select t1.a from t1 right join t2 on t1.a=t2.b offset 10"),
    ("cp1_simple_projection", "select a from t1"),
    ("cp2_agg_expr_pruning", "select sum(b)+1 from t1 where a > 1"),
    ("cp3_agg_pruning", "select sum(b) from t1 where a > 1"),
    ("cp4_left_join_filter_columns",
     "select t1.a, t2.b from t1 left join t2 on t1.a = t2.a where t2.b > 1"),
    ("cp5_scalar_subquery_cross_join",
     "select a, t2.v1 as max_b from t1 cross join (select max(b) as v1 from t1) t2"),
    ("cp6_two_scalar_subqueries",
     "select t1.a, sub0.v0, sub1.v0 from t1 "
     "cross join (select max(b) as v0 from t1) sub0 "
     "cross join (select min(b) as v0 from t1) sub1"),
    ("cp7_inline_scalar_subquery", "select a, (select max(b) from t1) from t1"),
    ("co1_collapse_projects", "select v + 1 from (select a + 1 as v from t1) q"),
    ("co2_combine_filters",
     "select a from (select * from t1 where b > 1) q where a > 0 and c < 9"),
    ("co3_pushdown_combined_subquery_filters",
     "select t.a from (select * from t1 where a > 1) t where t.b > 7"),
    ("sc1_simplify_casts", "select a from t1 where a > 1"),
]


def render_all() -> str:
    import sqlrs_tpu

    db = sqlrs_tpu.Database()
    db.run("create table t1(a int, b int, c int)")
    db.run("create table t2(a int, b int, c int)")
    parts = []
    for name, sql in GOLDEN_QUERIES:
        parts.append(f"==== {name}\n-- {sql}\n{db.explain(sql).rstrip()}\n")
    return "\n".join(parts) + "\n"


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    text = render_all()
    if "--apply" in argv:
        os.makedirs(os.path.dirname(SNAPSHOT), exist_ok=True)
        with open(SNAPSHOT, "w") as f:
            f.write(text)
        print(f"wrote {SNAPSHOT} ({len(GOLDEN_QUERIES)} plans)")
        return 0
    if not os.path.exists(SNAPSHOT):
        print(f"missing {SNAPSHOT}; run: python -m tests.plan_goldens --apply")
        return 1
    with open(SNAPSHOT) as f:
        want = f.read()
    if want != text:
        import difflib

        diff = "\n".join(difflib.unified_diff(
            want.splitlines(), text.splitlines(),
            "plans.snapshot", "current", lineterm="",
        ))
        print(diff)
        print("\nplan goldens CHANGED; if intended, regenerate with:"
              "\n  python -m tests.plan_goldens --apply")
        return 1
    print(f"plan goldens OK ({len(GOLDEN_QUERIES)} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Plan-shape regression guard: every driver query's physical plan must be
free of scale red flags (see tools/plan_audit.py). explain() is cheap —
plans are built, not executed (except the few queries whose construction
collects a bounded seed)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")


def test_no_plan_red_flags(spark):
    from plan_audit import audit

    problems = audit("/root/testdata/sf0.001", write_plans_md=False)
    assert problems == []

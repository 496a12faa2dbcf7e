"""Physical-plan audit: dump and lint the executed plans of every driver
query.

Three guards, all CI-enforced (tests/test_plan_audit.py):

- red flags: CartesianProduct / BroadcastNestedLoopJoin — an all-pairs
  join that cannot survive real data sizes (whitelisted only where the
  broadcast side is provably one bounded row, e.g. a single query
  vector) — and parquet scans with no pushed filter on queries that
  filter the scan table directly.
- operator-tree FINGERPRINTS for EVERY driver query: the formatted
  plan's tree section (operators, nesting, WholeStageCodegen `*` spans —
  ids stripped) is hashed and pinned in tools/plan_fingerprints.json.
  Any plan-shape change fails CI until deliberately re-pinned with
  `--write`; an unpinned (new) query also fails, so coverage cannot
  silently lapse.
- PLANS.md carries VERBATIM plans only for the ~20 headline queries
  (the full 130+ set used to make it a 1.2 MB regen-churn artifact; the
  fingerprints pin everything).

Usage: python tools/plan_audit.py [sf_dir] [--write]
  --write regenerates PLANS.md AND re-pins plan_fingerprints.json.
"""

from __future__ import annotations

import contextlib
import hashlib
import io
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

# deliberate bounded single-row/tiny broadcasts (query vector, centroid set)
NLJ_WHITELIST = {
    "quantized_topk",
    "dsir_select",
    "nation_hits",  # 2 × iters 1-row max-score normalizers
    "pmi_collocations",  # 1-row N (tokens) and B (bigrams) totals
    "stupid_backoff",  # 1-row N (model token total)
    "perplexity_buckets",  # same 1-row N broadcast via stupid_backoff_scores
    "vocab_growth",  # 8-row checkpoint dim range-joins two bounded aggs
    "snapshot_drift",  # 1-row totals + 1-row folded drift broadcasts
    "priority_sample",  # 1-row tau (the (k+1)-th priority) broadcast
}  # 1-row bounded broadcasts
# queries that should show a pushed filter on their scan
PUSHDOWN_EXPECTED = {"filter_eq", "filter_combo", "sample_mod"}

FINGERPRINTS_PATH = "/root/repo/tools/plan_fingerprints.json"

HEADLINE = [
    "filter_combo", "tpch_q1", "broadcast_enrich", "events_per_user_hour",
    "topk_users", "sessionize", "minhash_lsh", "simhash", "dup_clusters",
    "cosine_topk", "knn_join", "semdedup", "incremental_dedup",
    "registrable_domains", "bloom_prefilter", "grok_parse",
    "incremental_agg", "crawl_frontier", "tfidf_cosine_topk",
    "frontier_growth",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def tree_signature(df) -> str:
    """Hash of the OPTIMIZED LOGICAL operator tree — what Catalyst
    resolved the query to before physical planning. Deterministic by
    construction (no AQE stages, no cache-materialization state, no
    runtime statistics — the formatted PHYSICAL tree embeds all three
    for queries that execute during construction, e.g. pagerank's
    iteration loop, and flips between '== Initial ==' and '== Final =='
    shapes run to run). Expression/plan ids and in-memory relation
    cache-builder noise are normalized out; operator names, nesting,
    join types, literals, and pushed projections all ride the hash, so
    a shape regression (lost pushdown, join reorder, extra shuffle
    stage in the declared plan) changes it."""
    txt = df._jdf.queryExecution().optimizedPlan().toString()
    txt = re.sub(r"#\d+[A-Za-z]*", "", txt)  # expression ids
    txt = re.sub(r"plan_id=\d+", "plan_id=", txt)  # py4j plan ids
    # lambda variable names carry a session-global counter (x_11 vs x_34)
    txt = re.sub(r"\b([xyz])_\d+\b", r"\1_", txt)
    # common-subexpression names from Catalyst's With/CSE rewrite carry a
    # session-global counter too (_common_expr_0 vs _common_expr_3)
    txt = re.sub(r"\b_common_expr_\d+\b", "_common_expr_", txt)
    # Repartition counts follow defaultParallelism (8 under pytest's
    # local[8], 32 under the driver's local[32]) — environment, not shape
    txt = re.sub(r"\b(Repartition(?:ByExpression)?\b[^\n]*?), \d+\b", r"\1, N", txt)
    txt = re.sub(r"\bRepartition \d+\b", "Repartition N", txt)
    # cached-relation bodies: keep the InMemoryRelation marker, drop its
    # embedded physical cache-builder plan (execution-state-dependent)
    out, skip_depth = [], None
    for line in txt.splitlines():
        indent = len(line) - len(line.lstrip(" :+-"))
        if skip_depth is not None:
            if indent > skip_depth:
                continue
            skip_depth = None
        body = line.strip(" :+-")
        if body.startswith("InMemoryRelation"):
            out.append(f"{indent}|InMemoryRelation")
            skip_depth = indent
            continue
        out.append(f"{indent}|{body}")
    return hashlib.md5("\n".join(out).encode()).hexdigest()[:16]


def _elide(plan: str, max_line: int = 240) -> str:
    """Verbatim tree, elided detail blocks: detail lines carrying whole
    expression forests (a 64-perm MinHash projection is one 100 KB line)
    are cut at ``max_line`` chars — the operator/scan/exchange story stays
    readable and the file stays reviewable; the FULL shape is still pinned
    by the fingerprints."""
    out, in_tree = [], True
    for line in plan.splitlines():
        if in_tree and not line.strip() and out:
            in_tree = False
        if not in_tree and len(line) > max_line:
            line = line[: max_line - 12] + f" …[{len(line)} ch]"
        out.append(line)
    return "\n".join(out) + "\n"


def audit(sf_dir: str, write_plans_md: bool = False) -> list[str]:
    import __spark_entry__ as E
    from log_analysis_spark.session import get_spark

    spark = get_spark("plan-audit")
    # cached relations from earlier work in a shared session (pytest runs
    # the audit after ~400 other tests) get SUBSTITUTED into matching plan
    # subtrees by the CacheManager, changing the optimized tree — start
    # cache-free so fingerprints are context-independent
    spark.catalog.clearCache()
    problems: list[str] = []
    plans: dict[str, str] = {}
    sigs: dict[str, str] = {}
    for name, fn in E.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = plan_of(df)
            sigs[name] = tree_signature(df)
        except Exception as ex:  # noqa: BLE001
            problems.append(f"{name}: failed to build plan: {ex}")
            continue
        plans[name] = plan
        if "CartesianProduct" in plan:
            problems.append(f"{name}: CartesianProduct in plan")
        if "BroadcastNestedLoopJoin" in plan and name not in NLJ_WHITELIST:
            problems.append(f"{name}: BroadcastNestedLoopJoin in plan")
        if name in PUSHDOWN_EXPECTED and "PushedFilters: []" in plan:
            problems.append(f"{name}: scan has no pushed filters")

    if write_plans_md:
        with open(FINGERPRINTS_PATH, "w", encoding="utf-8") as f:
            json.dump(sigs, f, indent=1, sort_keys=True)
            f.write("\n")
        with open("/root/repo/PLANS.md", "w", encoding="utf-8") as f:
            f.write(
                "# PLANS — physical plans of the headline driver queries\n\n"
                "Generated by `python tools/plan_audit.py <sf_dir> --write`.\n"
                "The audit (also in tests/test_plan_audit.py) fails on any\n"
                "CartesianProduct / un-whitelisted BroadcastNestedLoopJoin /\n"
                "missing scan pushdown, so these shapes are pinned, not\n"
                "aspirational. EVERY driver query's operator-tree hash is\n"
                "additionally pinned in tools/plan_fingerprints.json — a\n"
                "plan-shape change anywhere fails CI until re-pinned with\n"
                "--write; only the ~20 headline plans below are kept\n"
                "verbatim. Things to look for: `PushedFilters` on scans,\n"
                "`BroadcastHashJoin` for dim joins, partial aggregates before\n"
                "every Exchange, `WholeStageCodegen` spans over the hot\n"
                "expressions.\n"
            )
            for name in HEADLINE:
                if name in plans:
                    f.write(f"\n## {name}\n\n```\n{_elide(plans[name])}```\n")
    elif os.path.exists(FINGERPRINTS_PATH):
        with open(FINGERPRINTS_PATH, encoding="utf-8") as f:
            pinned = json.load(f)
        for name, sig in sigs.items():
            if name not in pinned:
                problems.append(
                    f"{name}: no pinned plan fingerprint (new query? "
                    f"re-pin with --write)"
                )
            elif pinned[name] != sig:
                problems.append(
                    f"{name}: plan fingerprint changed "
                    f"({pinned[name]} -> {sig}; inspect, then re-pin with --write)"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    problems = audit(sf_dir, write_plans_md="--write" in sys.argv)
    for p in problems:
        print(f"RED FLAG: {p}")
    print(f"{len(problems)} red flags")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())

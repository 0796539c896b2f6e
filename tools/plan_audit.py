"""Physical-plan audit: sweep every registered query for scale red flags.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001)

For each query in the registry, renders the executed plan and flags:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — unbounded per-row
  work; fatal at 100 TB unless the query is allowlisted as intentionally
  all-pairs (brute-force kNN is the oracle baseline by design).
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan; the
  engine's contract is Arrow-batched pandas (`ArrowEvalPython` /
  `MapInPandas` / `FlatMapGroupsInPandas`) or pure JVM.
- ``SortAggregate`` — HashAggregate silently degrades to sort-based when
  an aggregate buffer type is immutable (e.g. min/max over strings);
  two extra sorts per aggregation at scale. Flagged as WARN.
- single-partition ``Window`` — a Window with an EMPTY partition spec
  requires AllTuples, so Spark plans ``Exchange SinglePartition`` under
  it: the whole input serializes through one task. Fatal at 100 TB
  unless the input is provably bounded (tiny dims, lossless-proof
  paths) and allowlisted in ``ALLOW_GLOBAL_WINDOW``.

Exit code 1 on any non-allowlisted fatal flag — wired into tests so plan
regressions fail CI, the same way the reference pins optimizer output
structurally (SURVEY §5.1).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

#: queries where an all-pairs or nested-loop join is the intended
#: semantics (exact baselines / tiny bounded sides), with the reason.
ALLOW_ALL_PAIRS = {
    "knn_bruteforce": "exact top-k baseline is all-pairs by definition",
    "dedup_ngram_jaccard": "pairwise Jaccard over a blocked candidate set",
    "dedup_embedding_pairs": "pairwise cosine over a blocked candidate set",
    "nation_pairs_same_region": "25-row dimension self-pairing (bounded)",
    "unigram_surprisal": "1-row scalar total broadcast onto the freq table",
    "bm25_doc_scores": "1-row (N, avgdl) scalar broadcast onto the tf table",
    "kmv_sketch_union": "three 1-row aggregates cross-joined into one row",
    "referential_audit": "1-row violation counts cross-joined per check row",
    "bigram_surprisal": "1-row scalar total broadcast onto the unigram table",
    "lsh_recall_report": "three 1-row counts cross-joined into one row",
    "ann_recall_report": "three 1-row counts cross-joined into one row",
    "hll_sketch_mergeability": "two 1-row sketch aggregates cross-joined",
    "theta_sketch_setops": "1-row sketch/exact aggregates cross-joined",
    "basket_brand_pairs": "1-row n_orders total broadcast onto the "
    "bounded 300-row brand-pair matrix",
    "matryoshka_recall_report": "two 1-row counts cross-joined into one row",
}

#: queries where a Window with an empty partition spec (one-task
#: Exchange SinglePartition) is justified, with the reason. Encoded so
#: an UNjustified global window fails the audit the day it appears.
ALLOW_GLOBAL_WINDOW = {
    # KMV direct path exists only to prove the merged path lossless
    "kmv_sketch_union": "direct KMV path is a prove-losslessness oracle",
    # 25-row nation dim: bounded by the data model
    "nations_indexed": "25-row dimension; zipWithIndex declares an order",
}

FATAL = ("CartesianProduct", "BroadcastNestedLoopJoin")
WARN = ("SortAggregate",)


def _top_level_groups(s: str) -> list[str]:
    """Top-level ``[...]`` group contents in a plan line suffix."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


def global_windows(plan: str) -> bool:
    """True if any Window node has an EMPTY partition spec.

    Window renders ``[functions]`` then an optional ``[partitionSpec]``
    then an optional ``[orderSpec]``. The partition spec is plain
    expressions; the order spec carries ASC/DESC sort markers. So the
    window is global exactly when the group AFTER the functions is an
    order spec (or absent entirely): 3 groups → partitioned; 2 groups →
    partitioned iff the second has no sort marker; 1 group → global.
    """
    for line in plan.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups = _top_level_groups(m.group(1))
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and not re.search(
            r"\b(ASC|DESC)\b", groups[1]
        ):
            continue  # [functions], [partitionSpec] — no order, fine
        return True
    return False


def audit(name: str, df) -> tuple[list[str], list[str]]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    fatals, warns = [], []
    for marker in FATAL:
        if marker in plan:
            (warns if name in ALLOW_ALL_PAIRS else fatals).append(marker)
    for marker in WARN:
        if marker in plan:
            warns.append(marker)
    if global_windows(plan):
        (warns if name in ALLOW_GLOBAL_WINDOW else fatals).append(
            "single-partition Window (empty partition spec)"
        )
    if re.search(r"\bBatchEvalPython\b", plan):
        fatals.append("BatchEvalPython (row-at-a-time Python UDF)")
    return fatals, warns


def main(sf_dir: str) -> int:
    from linqonsteroids_spark.queries import ALL
    from linqonsteroids_spark.session import get_spark

    spark = get_spark("plan_audit")
    n_fatal = 0
    for name, (fn, _sql) in sorted(ALL.items()):
        try:
            df = fn(spark, sf_dir)
            fatals, warns = audit(name, df)
        except Exception as e:  # pragma: no cover - surfaced for the report
            print(f"  ERROR {name}: {type(e).__name__}: {e}")
            n_fatal += 1
            continue
        if fatals:
            n_fatal += 1
            print(f"  FATAL {name}: {', '.join(fatals)}")
        elif warns:
            note = ALLOW_ALL_PAIRS.get(name) or ALLOW_GLOBAL_WINDOW.get(
                name
            )
            suffix = f" (allowed: {note})" if note else ""
            print(f"  warn  {name}: {', '.join(warns)}{suffix}")
        else:
            print(f"  ok    {name}")
    print("ALL CLEAN" if n_fatal == 0 else f"{n_fatal} FATAL PLANS")
    return 0 if n_fatal == 0 else 1


if __name__ == "__main__":
    from tools.evidence_lock import _acquire_cli  # noqa: E402

    _acquire_cli("plan_audit")
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))

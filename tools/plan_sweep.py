"""Plan-only duplicate-subtree sweep (r16): build every registered
query's physical plan and count parquet scans, Exchanges, Windows and
Python stages. Rank by scans — repeated scans of the same relation are
the no-cross-branch-CSE signature (guide §2.2) that r15/r16 keep
hunting. Measurement tool only; never touches the bench contract.

Usage: python tools/plan_sweep.py [sf_dir] [--only name1,name2]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def main(sf_dir: str, only: set[str] | None = None) -> int:
    from linqonsteroids_spark.queries import ALL
    from linqonsteroids_spark.session import get_spark

    spark = get_spark("plan_sweep")
    rows = []
    for name, (fn, _sql) in sorted(ALL.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            rows.append((name, -1, -1, -1, -1, f"ERR {type(e).__name__}"))
            continue
        scans = len(re.findall(r"Scan parquet", plan))
        exch = len(re.findall(r"Exchange", plan))
        wins = len(re.findall(r"\bWindow\b", plan))
        py = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|PythonMapInArrow|MapInArrow", plan)
        )
        rows.append((name, scans, exch, wins, py, ""))
    rows.sort(key=lambda r: (-r[1], -r[2]))
    print(f"{'query':44s} {'scans':>5s} {'exch':>5s} {'win':>4s} {'py':>3s}")
    for name, s, e, w, p, err in rows:
        print(f"{name:44s} {s:5d} {e:5d} {w:4d} {p:3d} {err}")
    return 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        only = set(argv[argv.index("--only") + 1].split(","))
        argv = argv[: argv.index("--only")]
    sys.exit(main(argv[0] if argv else "/root/testdata/sf0.1", only))

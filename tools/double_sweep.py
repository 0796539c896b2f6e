"""Same-session double-invocation sweep: every registered gate runs
TWICE in one SparkSession and must return identical row sets.

What this catches that the oracle differential cannot: stateful
artifacts that drift across invocations — scratch-dir caching that
reuses a stale MV, streaming checkpoints that resume instead of
restart, registries that accumulate, temp views that collide. Zero
drift is the repository-semantics contract (build → reuse must be
bit-identical to build → rebuild).

Usage: python tools/double_sweep.py [sf_dir] [--only name1,name2]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main(sf_dir: str, only: set[str] | None = None) -> int:
    from linqonsteroids_spark.queries import ALL
    from linqonsteroids_spark.session import get_spark

    spark = get_spark("double_sweep")
    failures = 0
    n_runs = 0
    for name, (fn, _sql) in sorted(ALL.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # repr-keyed sort: total order even when rollup/cube rows
            # carry NULL group keys (None < str raises under the default
            # tuple ordering)
            first = sorted(
                (tuple(r) for r in fn(spark, sf_dir).collect()), key=repr
            )
            second = sorted(
                (tuple(r) for r in fn(spark, sf_dir).collect()), key=repr
            )
            n_runs += 2
        except Exception as e:  # noqa: BLE001
            print(f"  ERROR {name}: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if first != second:
            diff = sum(1 for a, b in zip(first, second) if a != b)
            diff += abs(len(first) - len(second))
            print(
                f"  DRIFT {name}: rows {len(first)} vs {len(second)}, "
                f"{diff} differing [{time.time() - t0:.1f}s]"
            )
            failures += 1
        else:
            print(
                f"  PASS {name}: {len(first)} rows x2 identical "
                f"[{time.time() - t0:.1f}s]"
            )
    print(
        f"{'ALL STABLE' if not failures else f'{failures} FAILURES'} "
        f"({n_runs} invocations)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    from tools.evidence_lock import _acquire_cli  # noqa: E402

    _acquire_cli("double_sweep")
    only = None
    consumed: set[int] = set()
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a.startswith("--only"):
            if "=" in a:
                only = set(a.split("=", 1)[1].split(","))
            else:
                # space-separated form: the value is the NEXT argv entry
                # and must not also be taken as the positional sf_dir
                if i + 1 >= len(argv):
                    raise SystemExit(
                        "usage: --only=a,b or --only a,b (value missing)"
                    )
                only = set(argv[i + 1].split(","))
                consumed.add(i + 1)
    args = [
        a
        for i, a in enumerate(argv)
        if not a.startswith("--") and i not in consumed
    ]
    sf = args[0] if args else "/root/testdata/sf0.001"
    raise SystemExit(main(sf, only))

"""Standalone differential check at any SF:
python tools/check_correctness.py [sf_dir] [--only name1,name2].

Mirrors the driver's gate: row count + schema + order-insensitive values
for every query with an oracle.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import duckdb

    from linqonsteroids_spark.queries import ALL
    from linqonsteroids_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, (fn, sql) in sorted(ALL.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if sql is not None:
                # SHAPE-HAZARD: the driver canonicalizes through pandas
                # sort_values, which dies on unhashable list/struct/map
                # cells (the r6 array-column failure class). Gated output
                # must be scalar-only on BOTH engines.
                nonscalar = [
                    f"{f.name}:{f.dataType.simpleString()}"
                    for f in sdf.schema.fields
                    if f.dataType.typeName() in ("array", "map", "struct")
                ]
                if nonscalar:
                    print(
                        f"  FAIL {name}: SHAPE-HAZARD (non-scalar gated "
                        f"columns, driver pandas sort dies) {nonscalar}"
                    )
                    failures += 1
                    continue
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = list(sdf.columns)
            if sql is None:
                print(f"  {name}: rows={len(s_rows)} (no oracle) [{time.time()-t0:.1f}s]")
                continue
            # Type audit first: fetchall() below returns exact Python
            # ints/Decimals, but the DRIVER hashes through pandas, where
            # DuckDB degrades HUGEINT/DECIMAL to float64 (the r4/r5
            # chronic-red root cause). Fail loudly on those types so this
            # checker can never pass a gate the driver would red.
            import re as _re

            hazard = [
                f"{c}:{t}"
                for c, t in zip(con.sql(sql).columns, con.sql(sql).types)
                if _re.search(r"HUGEINT|UHUGEINT|DECIMAL", str(t), _re.I)
            ]
            if hazard:
                print(f"  FAIL {name}: TYPE-HAZARD (pandas-degrading oracle types) {hazard}")
                failures += 1
                continue
            shape_hazard = [
                f"{c}:{t}"
                for c, t in zip(con.sql(sql).columns, con.sql(sql).types)
                if _re.search(r"\[\]|\bSTRUCT\b|\bMAP\b|\bUNION\b", str(t), _re.I)
            ]
            if shape_hazard:
                print(
                    f"  FAIL {name}: SHAPE-HAZARD (non-scalar oracle "
                    f"columns, driver pandas sort dies) {shape_hazard}"
                )
                failures += 1
                continue
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
            ok = sorted(s_cols) == sorted(d_cols) and len(s_rows) == len(d_rows)
            detail = ""
            if ok:
                s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                key = lambda r: tuple((v is None, str(v)) for v in r)  # noqa: E731
                s_sorted = sorted((tuple(r[i] for i in s_order) for r in s_rows), key=key)
                d_sorted = sorted((tuple(r[i] for i in d_order) for r in d_rows), key=key)
                bad = 0
                exact_bad = 0
                for sr, dr in zip(s_sorted, d_sorted):
                    for a, b in zip(sr, dr):
                        if a is None and b is None:
                            continue
                        if isinstance(a, float) and isinstance(b, float):
                            if a != b:
                                exact_bad += 1
                                if not (
                                    (math.isnan(a) and math.isnan(b))
                                    or math.isclose(a, b, rel_tol=0, abs_tol=1e-9)
                                ):
                                    bad += 1
                        elif a != b:
                            bad += 1
                            exact_bad += 1
                ok = bad == 0
                detail = f" rows={len(s_rows)} exact_diffs={exact_bad} tol_diffs={bad}"
            else:
                detail = (
                    f" schema/count mismatch: spark {len(s_rows)}x{sorted(s_cols)}"
                    f" vs duck {len(d_rows)}x{sorted(d_cols)}"
                )
            print(f"  {'PASS' if ok else 'FAIL'} {name}:{detail} [{time.time()-t0:.1f}s]")
            failures += 0 if ok else 1
        except Exception as e:  # noqa: BLE001
            print(f"  ERROR {name}: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    from tools.evidence_lock import _acquire_cli  # noqa: E402

    _acquire_cli("check_correctness")
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    if "--window" in argv:
        # exactly the driver's correctness sample: the FIRST 50 registry
        # entries in insertion order (what CORRECTNESS_r{N}.json covers)
        argv.remove("--window")
        from linqonsteroids_spark.queries import ALL as _all

        only = set(list(_all)[:50])
    sys.exit(main(argv[0] if argv else "/root/testdata/sf0.01", only))

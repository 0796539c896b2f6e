"""Print the next round's correctness-window rotation plan.

Usage: python tools/rotation_plan.py

The driver snapshots the FIRST 50 registry entries (insertion order).
Policy encoded here, derived from the round-2 verdict: every query whose
latest green driver row is oldest goes first — (1) never-green, (2) never
checked, (3) stalest green — until the 50 slots fill. Paste the output
into ``_ROTATION`` in ``linqonsteroids_spark/queries/__init__.py``.
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from linqonsteroids_spark.queries import ALL

    last_green: dict[str, int] = {}
    checked: dict[str, int] = {}
    rounds = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    for path in rounds:
        rnd = int(path.rsplit("r", 1)[1].split(".")[0])
        for name, row in json.load(open(path)).items():
            checked[name] = max(checked.get(name, 0), rnd)
            # a rows-only gate (err == no_oracle, by design) can never
            # hash-green; its best evidence is a successful driver run —
            # count that as green or the gate burns a window slot forever.
            rows_only_ok = (
                row.get("err") == "no_oracle"
                and (row.get("spark_rows") or 0) > 0
            )
            if row.get("hash_match") or rows_only_ok:
                last_green[name] = max(last_green.get(name, 0), rnd)

    # Rows-only gates (no oracle by design) burn a window slot only to
    # return err=no_oracle — their correctness evidence is the bit-exact
    # pytest twins machine-checked by test_registry.py (r12 verdict item
    # 4). Keep them OUT of the driver window entirely.
    names = [n for n in ALL if ALL[n][1] is not None]
    excluded = [n for n in ALL if ALL[n][1] is None]
    # staleness key: (last green round, last checked round) — never-green
    # and never-checked sort first; ties keep registry order (stable sort)
    ranked = sorted(
        names, key=lambda n: (last_green.get(n, -1), checked.get(n, -1))
    )
    window = ranked[:50]
    print(f"# registry: {len(ALL)} queries ({len(excluded)} rows-only "
          f"excluded from window: {excluded}); latest round file: "
          f"{rounds[-1] if rounds else 'none'}")
    print("# window (paste into _ROTATION, grouped by staleness):")
    for n in window:
        print(f'    "{n}",  # green r{last_green.get(n, "-")} '
              f'checked r{checked.get(n, "-")}')
    stale_out = [n for n in ranked[50:] if last_green.get(n, 0) < (
        max((int(p.rsplit("r", 1)[1].split(".")[0]) for p in rounds), default=0)
    )]
    print(f"# outside window without latest-round green: {len(stale_out)}")
    # the full ordering past the window, so next round's note never has
    # to reconstruct cohort tails by hand (r10 lesson)
    print("# next in line (positions 51+, same staleness order):")
    for n in ranked[50:]:
        if last_green.get(n, 0) >= max(
            (int(p.rsplit("r", 1)[1].split(".")[0]) for p in rounds),
            default=0,
        ):
            break
        print(f'    "{n}",  # green r{last_green.get(n, "-")} '
              f'checked r{checked.get(n, "-")}')


if __name__ == "__main__":
    main()

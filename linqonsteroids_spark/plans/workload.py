"""Saved-workload replay: persist observed query shapes, advise offline.

The missing half of the SparkCruise loop (VLDB 2021): a production
advisor does not live inside one driver process. Query SHAPES are
appended to a log as queries run — pure plan metadata, a few bytes per
query, no data ever touched — and a separate offline job replays the
accumulated log through a fresh ``WorkloadAdvisor`` to decide what to
materialize for tomorrow's workload. This module is that persistence
format plus the replay entry point:

- ``WorkloadLog.record(q)`` mines the same patterns live observation
  mines (``advisor.mine_patterns``: filter-key equalities and join-chain
  signatures) and appends them as one JSONL line per query. Logging is
  O(plan) and session-independent — the log from any number of
  processes/days can be concatenated (JSONL is append-mergeable).
- ``WorkloadLog.replay_into(advisor)`` streams the log back into an
  advisor's counters via ``ingest`` — no SparkSession required for the
  replay itself; only ``auto_materialize`` touches data, once per
  advised index.

End-to-end: record N queries → replay → ``advisor.advise()`` →
``auto_materialize()`` → every later query with the advised shape
rewrites to the shared MV (``IndexRepository.optimize``). Gated by
``workload_replay_lookup`` (queries/engine.py) and exercised standalone
by ``tools/workload_replay.py``.
"""

from __future__ import annotations

import json
import os

from linqonsteroids_spark.api import Lifted
from linqonsteroids_spark.plans.advisor import WorkloadAdvisor, mine_patterns


class WorkloadLog:
    """Append-only JSONL log of advisable query shapes.

    One line per recorded query:
    ``{"filters": [[table, col], ...], "joins": [[tables, keys], ...],
    "aggs": [[table, key, sums, mins, maxs], ...]}``.
    """

    def __init__(self, path: str):
        self.path = path

    def record(self, q: Lifted) -> Lifted:
        """Mine and append ``q``'s shapes; returns ``q`` unchanged so
        call sites wrap submission transparently (the observe contract)."""
        filter_pats, join_sigs, agg_sigs = mine_patterns(q)
        entry = {
            "filters": [list(p) for p in filter_pats],
            "joins": [
                [list(tables), [list(k) for k in keys]]
                for tables, keys in join_sigs
            ],
            "aggs": [
                [table, key, list(sums), list(mins), list(maxs)]
                for table, key, sums, mins, maxs in agg_sigs
            ],
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        return q

    def entries(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def replay_into(self, advisor: WorkloadAdvisor) -> int:
        """Stream every logged query's shapes into ``advisor``; returns
        the number of replayed log entries. Driver-side only — replay
        never runs a query."""
        n = 0
        for e in self.entries():
            filter_pats = [tuple(p) for p in e.get("filters", [])]
            join_sigs = [
                (tuple(tables), tuple(tuple(k) for k in keys))
                for tables, keys in e.get("joins", [])
            ]
            agg_sigs = [
                (table, key, tuple(sums), tuple(mins), tuple(maxs))
                for table, key, sums, mins, maxs in e.get("aggs", [])
            ]
            advisor.ingest(filter_pats, join_sigs, agg_sigs)
            n += 1
        return n

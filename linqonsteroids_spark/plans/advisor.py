"""Workload-level index advisor: SparkCruise-style computation reuse.

SparkCruise (VLDB 2021, "Workload Optimization in Managed Spark Clusters
at Microsoft") mines repeated subplans across a workload's query logs and
materializes the common computation once; every later query that contains
the subplan reads the materialized artifact instead. The reference's
``addIndex`` (SURVEY §2.10, ``Optimization.scala``) is the MANUAL form of
the same idea — a human decides what to index. This module closes the
loop automatically:

1. ``observe(q)`` records each submitted query's logical description
   (``PlanInfo``: base table + recorded filter structures — the same
   representation ``IndexRepository.optimize`` matches against).
2. ``advise()`` mines the observations for repeated ``col == const``
   equality patterns per (table, column) — the filter→index shape — and
   returns every pattern seen at least ``min_count`` times that has no
   registered index yet.
3. ``auto_materialize()`` registers an index for each advised pattern;
   from then on ``optimize()`` rewrites EVERY matching query (past
   shapes and future ones) to the shared hash-partitioned MV.

Scale: observation is pure driver-side metadata (a Counter over plan
structures — no data touched); materialization cost is one scan + one
shuffle per advised index, paid once and amortized across the workload,
exactly the SparkCruise trade. ``min_count`` is the knob: 2 = any repeat
pays; raise it when storage is the constraint.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Callable

from linqonsteroids_spark.api import Lifted
from linqonsteroids_spark.plans.registry import (
    IndexEntry,
    IndexRepository,
    match_key_equality,
    match_key_in,
    match_key_range,
    split_conjuncts,
)


def mine_patterns(
    q: Lifted,
) -> tuple[list[tuple[str, str]], list[tuple], list[tuple]]:
    """Extract the advisable shapes from one query: ``(table, column)``
    for every conjunct matching the filter→index pattern, the join
    signature (tables, keys) for rewritable join chains — side/post
    filters stay per-query residuals, so ONE join MV serves every
    differently-filtered repetition — and the rollup signature
    ``(table, key_col, sums, mins, maxs)`` for tracked ``agg_summary``
    shapes (a wider MV serves every narrower repetition, so the advisor
    accumulates the UNION of requested columns). Pure driver-side plan
    metadata; no data is touched. Shared by live observation
    (WorkloadAdvisor) and persisted logs (plans/workload.py)."""
    plan = q.plan
    filter_pats: list[tuple[str, str]] = []
    join_sigs: list[tuple] = []
    agg_sigs: list[tuple] = []
    if plan.rewritable and plan.base_table and not plan.lets:
        for f in plan.filters:
            for conj in split_conjuncts(f):
                m = match_key_equality(conj)
                if m is not None:
                    filter_pats.append((plan.base_table, m[0]))
                    continue
                # range conjuncts mine to the SAME (table, column)
                # pattern (r10): the key-ordered index serves both
                # shapes, so an equality query and a range query on one
                # column jointly justify one index
                kr = match_key_range(conj)
                if kr is not None:
                    filter_pats.append((plan.base_table, kr[0]))
                    continue
                # IN-list conjuncts too (r11): a union of equalities on
                # one column is the same advisable pattern
                ki = match_key_in(conj)
                if ki is not None:
                    filter_pats.append((plan.base_table, ki[0]))
    if plan.rewritable and plan.join is not None:
        join_sigs.append(plan.join.signature)
    if plan.agg is not None:
        ai = plan.agg
        agg_sigs.append((ai.table, ai.key_col, ai.sums, ai.mins, ai.maxs))
    return filter_pats, join_sigs, agg_sigs


class WorkloadAdvisor:
    """Observes Lifted queries, mines repeated filter-key patterns, and
    auto-registers indexes for the hot ones.

    ``sources`` maps table name → a zero-argument provider of the
    UNFILTERED base-table scan (what ``add_index`` materializes from);
    typically ``lambda: lift(load_table(...), table=t)``.
    """

    def __init__(
        self,
        repo: IndexRepository,
        sources: dict[str, Callable[[], Lifted]],
        min_count: int = 2,
    ):
        self.repo = repo
        self.sources = dict(sources)
        self.min_count = min_count
        self._patterns: Counter[tuple[str, str]] = Counter()
        self._join_patterns: Counter[tuple] = Counter()
        self._agg_patterns: Counter[tuple[str, str]] = Counter()
        # (table, key_col) -> [set(sums), set(mins), set(maxs)]: the
        # UNION of every observed request, so one covering MV answers
        # all of them by subset matching
        self._agg_cols: dict[tuple[str, str], list[set]] = {}

    def observe(self, q: Lifted) -> Lifted:
        """Record the query's filter-key, join-chain, and rollup
        patterns; returns ``q`` unchanged so call sites can wrap
        submission transparently."""
        filter_pats, join_sigs, agg_sigs = mine_patterns(q)
        self.ingest(filter_pats, join_sigs, agg_sigs)
        return q

    def ingest(
        self,
        filter_pats: list[tuple[str, str]],
        join_sigs: list[tuple],
        agg_sigs: list[tuple] = (),
    ) -> None:
        """Feed pre-mined patterns into the counters — the replay entry
        point for persisted workload logs (plans/workload.py), which
        carry exactly what ``mine_patterns`` extracts live."""
        for pat in filter_pats:
            self._patterns[pat] += 1
        for sig in join_sigs:
            self._join_patterns[sig] += 1
        for table, key_col, sums, mins, maxs in agg_sigs:
            self._agg_patterns[(table, key_col)] += 1
            cols = self._agg_cols.setdefault(
                (table, key_col), [set(), set(), set()]
            )
            cols[0] |= set(sums)
            cols[1] |= set(mins)
            cols[2] |= set(maxs)

    def advise(self) -> list[tuple[str, str, int]]:
        """(table, column, observations) for every pattern at or above
        ``min_count`` that is not yet indexed and has a known source."""
        out = []
        for (table, col), n in self._patterns.most_common():
            if n < self.min_count:
                break  # most_common is sorted — nothing hotter follows
            if (table, col) in self.repo._by_table_key:
                continue
            if table not in self.sources:
                continue
            out.append((table, col, n))
        return out

    def advise_joins(self) -> list[tuple[tuple, int]]:
        """(join signature, observations) for repeated join chains whose
        tables all have known sources and no registered join MV yet."""
        out = []
        for sig, n in self._join_patterns.most_common():
            if n < self.min_count:
                break
            if sig in self.repo._joins:
                continue
            tables, _keys = sig
            if not all(t in self.sources for t in tables):
                continue
            out.append((sig, n))
        return out

    def advise_aggs(self) -> list[tuple[str, str, int, tuple, tuple, tuple]]:
        """(table, key_col, observations, sums, mins, maxs) for repeated
        rollup shapes with no registered agg MV yet — column tuples are
        the sorted UNION of every observed request (one covering MV
        answers all of them by subset matching)."""
        out = []
        for (table, key_col), n in self._agg_patterns.most_common():
            if n < self.min_count:
                break
            if (table, key_col) in self.repo._agg_mvs:
                continue
            if table not in self.sources:
                continue
            sums, mins, maxs = self._agg_cols[(table, key_col)]
            out.append(
                (
                    table,
                    key_col,
                    n,
                    tuple(sorted(sums)),
                    tuple(sorted(mins)),
                    tuple(sorted(maxs)),
                )
            )
        return out

    def _rebuild_chain(self, sig: tuple) -> Lifted:
        """Reconstruct the UNFILTERED left-deep chain from its signature —
        what add_join_index materializes (observed queries carry filters;
        those remain residuals of the rewrite, not part of the MV)."""
        tables, keys = sig
        acc = self.sources[tables[0]]()
        for table, (lk, rk) in zip(tables[1:], keys):
            acc = acc.join(
                self.sources[table](),
                lambda l, k=lk: l[k],
                lambda r, k=rk: r[k],
            )
        return acc

    def auto_materialize(self) -> list[IndexEntry]:
        """Register an index/join-MV for every advised pattern. Idempotent:
        a second call advises nothing new (registered entries filter the
        next ``advise``/``advise_joins``)."""
        entries: list = []
        for table, col, _n in self.advise():
            src = self.sources[table]()
            indexed = src.index_by(lambda r, c=col: r[c], key_name=col)
            entries.append(self.repo.add_index(f"adv_{table}_{col}", indexed))
        for sig, _n in self.advise_joins():
            tables, _keys = sig
            name = "adv_join_" + "_".join(tables)
            entries.append(self.repo.add_join_index(name, self._rebuild_chain(sig)))
        for table, key_col, _n, sums, mins, maxs in self.advise_aggs():
            src = self.sources[table]()
            indexed = src.index_by(lambda r, c=key_col: r[c], key_name=key_col)
            entries.append(
                self.repo.add_agg_index(
                    f"adv_agg_{table}_{key_col}",
                    indexed,
                    sums=sums,
                    mins=mins,
                    maxs=maxs,
                )
            )
        return entries

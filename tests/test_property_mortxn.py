"""Property-based tests (hypothesis) for multi-table MOR transactions.

hypothesis generates a random interleaving of operations over TWO
tables sharing one decision log: transactional takedown/upsert pairs
(outcome drawn from commit / abort / left-undecided) interleaved with
plain non-transactional appends. A python model replays only the
ops that SHOULD be visible, applying them in VERSION order (MOR
last-wins resolves by version number, not by commit wall-clock — a
late-committed transaction's version slots in BELOW later normal
appends, and the read must reflect exactly that). Invariants:

- each table's ``read()`` equals its model state at every checkpoint
  (after the interleaving, after a fresh-handle recovery pass, and
  after the undecided transactions are randomly late-committed or
  force-aborted);
- transactions are atomic ACROSS tables: a txn's ops are in both
  models or neither (by construction of the model — the assertion is
  that the tables match those models through every phase);
- recovery sweeps aborted debris and leaves undecided claims alone
  (claimed-but-invisible), and late decisions flip both tables
  together.

This is the same suite shape the r14 verdict endorsed for the change
feed family: interleaving-reachable bugs (late commit below a newer
normal append, abort racing recovery, double-resolution) shrink to a
minimal op sequence.
"""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("k", StringType(), False),
        StructField("x", IntegerType(), True),
    ]
)

_keys = st.integers(min_value=0, max_value=5).map(lambda i: f"k{i}")
_x = st.integers(min_value=-3, max_value=3)
_snapshot = st.dictionaries(_keys, _x, max_size=4)
_change = st.tuples(
    st.dictionaries(_keys, _x, max_size=3),  # upserts
    st.sets(_keys, max_size=2),  # delete keys
)
# one step of the interleaving: a transactional pair over both tables
# with a drawn outcome, or a plain append to one table
_txn_step = st.tuples(
    st.just("txn"),
    _change,
    _change,
    st.sampled_from(["commit", "abort", "undecided"]),
)
_plain_step = st.tuples(
    st.just("plain"), st.sampled_from(["a", "b"]), _change
)
_steps = st.lists(
    st.one_of(_txn_step, _plain_step), min_size=1, max_size=4
)


def _model_state(base: dict, applied: list) -> dict:
    """Fold (version-ordered) committed changes over the base."""
    state = dict(base)
    for _v, (ups, dels) in sorted(applied):
        for k in dels:
            state.pop(k, None)
        for k, x in ups.items():
            state[k] = x
    return state


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    base_a=_snapshot,
    base_b=_snapshot,
    steps=_steps,
    late=st.lists(st.booleans(), min_size=4, max_size=4),
)
def test_txn_interleavings_match_model(
    spark, tmp_path, base_a, base_b, steps, late
):
    from linqonsteroids_spark.operators.mor import MorTable
    from linqonsteroids_spark.operators.mortxn import MorTxnLog

    run = uuid.uuid4().hex[:8]

    def df(d):
        return spark.createDataFrame(
            [(k, x) for k, x in sorted(d.items())], _SCHEMA
        )

    paths = {
        "a": str(tmp_path / f"ta_{run}"),
        "b": str(tmp_path / f"tb_{run}"),
    }
    tables = {
        n: MorTable(spark, p, "k") for n, p in paths.items()
    }
    tables["a"].write_base(df(base_a))
    tables["b"].write_base(df(base_b))
    log = MorTxnLog(str(tmp_path / f"log_{run}"))

    applied = {"a": [], "b": []}  # (version, change) for visible ops
    pending = []  # (txn, {table: (version, change)}) undecided

    for step in steps:
        if step[0] == "plain":
            _, name, (ups, dels) = step
            dels = {k for k in dels if k not in ups}
            if not ups and not dels:
                continue
            v = tables[name].append_delta(
                upserts=df(ups) if ups else None,
                delete_keys=(
                    df({k: 0 for k in dels}).select("k") if dels else None
                ),
            )
            applied[name].append((v, (ups, dels)))
        else:
            _, ch_a, ch_b, outcome = step
            changes = {"a": ch_a, "b": ch_b}
            txn = log.begin()
            enlisted = {}
            for name, (ups, dels) in changes.items():
                dels = {k for k in dels if k not in ups}
                if not ups and not dels:
                    continue
                v = tables[name].append_delta(
                    upserts=df(ups) if ups else None,
                    delete_keys=(
                        df({k: 0 for k in dels}).select("k")
                        if dels
                        else None
                    ),
                    txn=txn,
                )
                enlisted[name] = (v, (ups, dels))
            if not enlisted:
                continue
            if outcome == "commit":
                txn.commit()
                for name, rec in enlisted.items():
                    applied[name].append(rec)
            elif outcome == "abort":
                txn.abort()
            else:
                pending.append((txn, enlisted))

    def check(handles):
        for name in ("a", "b"):
            got = {
                r["k"]: r["x"] for r in handles[name].read().collect()
            }
            want = _model_state(
                base_a if name == "a" else base_b, applied[name]
            )
            assert got == want, (name, got, want)

    check(tables)

    # fresh-handle recovery: aborted debris swept, undecided claims
    # intact and still invisible
    fresh = {n: MorTable(spark, p, "k") for n, p in paths.items()}
    check(fresh)
    for _txn, enlisted in pending:
        for name, (v, _c) in enlisted.items():
            assert v in fresh[name]._all_claimed_versions()
            assert v not in fresh[name]._existing_versions()

    # resolve the undecided transactions: late commits must surface on
    # BOTH tables at their ORIGINAL (allocation-time) versions — i.e.
    # below any newer plain append — and force-aborts on neither
    for i, (txn, enlisted) in enumerate(pending):
        if late[i % len(late)]:
            txn.commit()
            for name, rec in enlisted.items():
                applied[name].append(rec)
        else:
            log.force_abort(txn.id)
    check(fresh)

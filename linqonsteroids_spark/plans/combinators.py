"""Rewrite-strategy combinators — the reference's transformation-combinator
DSL (``TransformationCombinators.scala:140-210``: strategies as
``Exp → Option[Exp]`` functions composed with sequencing, choice, and a
Kleene-star fixpoint), re-expressed over ``Lifted`` queries.

Division of labor (SURVEY §7.2): generic algebraic rewrites — fusion,
pushdown, join recognition, constant folding — belong to Catalyst and are
NOT re-implemented here. What this layer composes is the rewrites Catalyst
cannot know about: materialized-view/index substitution (the repository's
``optimize``), engine-specific physical strategies (salting, bucketing),
and user-supplied rules. A rule is any ``Lifted → Lifted | None`` callable:
``None`` (or returning the input object) means "did not apply".

The reference composes its optimizer the same way — ``shareSubqueries``
is one strategy run to fixpoint over the expression tree; here the tree
walk is unnecessary (rules see the whole query plus its PlanInfo), so the
combinators compose at query granularity.
"""

from __future__ import annotations

from collections.abc import Callable

from linqonsteroids_spark.api import Lifted

#: a rewrite rule: returns a NEW Lifted when it applied, or None / the
#: input itself when it did not
Rule = Callable[[Lifted], "Lifted | None"]


def apply_rule(rule: Rule, q: Lifted) -> Lifted | None:
    """Normalize rule output: None or the identical object → no match."""
    out = rule(q)
    if out is None or out is q:
        return None
    return out


def seq(*rules: Rule) -> Rule:
    """Sequencing (``andThen``): apply each rule in order, threading the
    result; applies iff at least one constituent applied."""

    def run(q: Lifted) -> Lifted | None:
        cur, applied = q, False
        for r in rules:
            nxt = apply_rule(r, cur)
            if nxt is not None:
                cur, applied = nxt, True
        return cur if applied else None

    return run


def first_of(*rules: Rule) -> Rule:
    """Choice (``orElse``): the first rule that applies wins."""

    def run(q: Lifted) -> Lifted | None:
        for r in rules:
            out = apply_rule(r, q)
            if out is not None:
                return out
        return None

    return run


def exhaust(rule: Rule, max_iterations: int = 16) -> Rule:
    """Kleene star (``repeat``/fixpoint): re-apply until the rule stops
    matching. ``max_iterations`` guards against non-terminating rule sets
    (the reference's combinators carry the same caveat); substitution-style
    rules terminate naturally because their output plans are non-rewritable.
    """

    def run(q: Lifted) -> Lifted | None:
        cur: Lifted | None = None
        nxt = apply_rule(rule, q)
        n = 0
        while nxt is not None:
            cur = nxt
            n += 1
            if n >= max_iterations:
                raise RuntimeError(
                    f"exhaust: rule still matching after {max_iterations} iterations"
                )
            nxt = apply_rule(rule, cur)
        return cur

    return run


def attempt(rule: Rule) -> Callable[[Lifted], Lifted]:
    """Total version (``try``): the query itself when the rule does not
    apply — the shape callers want at the top level."""

    def run(q: Lifted) -> Lifted:
        out = apply_rule(rule, q)
        return q if out is None else out

    return run


def index_substitution(repo) -> Rule:
    """The repository's MV/index rewrite as a composable rule (the
    reference runs ``shareSubqueries`` exactly this way: one strategy in
    the optimizer pipeline)."""

    def run(q: Lifted) -> Lifted | None:
        return apply_rule(repo.optimize, q)

    return run

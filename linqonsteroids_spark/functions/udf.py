"""Named UDF registry — the reference's ``fmap`` opaque-call contract.

Reference: ``fmap(args…)(Symbol, f)`` wraps arbitrary functions in named,
equality-comparable ``Call*`` nodes (``Call.scala:18-35``) — opaque to
optimization except for equality/CSE, exactly like a Spark UDF is opaque
to Catalyst. The identity contract (same symbol + args ⇒ equal nodes,
``CallTests.scala:12-53``) is what makes repeated applications CSE-able
and results cacheable.

Here: UDFs must be **registered once under a stable name**; ``fmap(name)``
always returns the same function object, so identical applications build
identical Column expressions (Catalyst dedupes them), and anonymous
lambdas are kept out of cacheable positions (SURVEY §7.2). Pandas
(Arrow-vectorized) is the default kind — row-at-a-time Python is the slow
path and exists only for quick prototyping.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_REGISTRY: dict[str, dict] = {}  # name -> {fn, returns, kind, wrapped|None}


def register(name: str, returns: str = "double", kind: str = "pandas") -> Callable:
    """Decorator: register a UDF under a stable name.

    kind='pandas': fn takes/returns pandas Series (Arrow-vectorized).
    kind='python': row-at-a-time fallback (slow path; avoid in hot paths).

    Wrapping into a Spark UDF is deferred to first use — pandas_udf needs
    an active SparkSession, and registration happens at import time.
    """
    if kind not in ("pandas", "python"):
        raise ValueError(f"unknown kind {kind!r}")

    def deco(fn: Callable) -> Callable:
        entry = _REGISTRY.get(name)
        if entry is not None:
            if entry["fn"] is not fn:
                raise ValueError(
                    f"UDF name {name!r} already registered with a different function; "
                    "names are identities (fmap contract) and must be stable"
                )
            return fn
        _REGISTRY[name] = {"fn": fn, "returns": returns, "kind": kind, "wrapped": None}
        return fn

    return deco


def fmap(name: str) -> Callable[..., Column]:
    """Apply the named UDF: ``fmap('squash')(col)``. Same name ⇒ same
    function object ⇒ identical plan expressions (CSE-able)."""
    if name not in _REGISTRY:
        raise KeyError(f"no UDF registered under {name!r}; register(name, ...) first")
    entry = _REGISTRY[name]
    if entry["wrapped"] is None:
        if entry["kind"] == "pandas":
            entry["wrapped"] = pandas_udf(entry["returns"])(entry["fn"])
        else:
            entry["wrapped"] = F.udf(entry["fn"], entry["returns"])
    return entry["wrapped"]


def registered(name: str) -> bool:
    return name in _REGISTRY


def collect_udf(name: str) -> Callable[..., Column]:
    """PartialFuncExp surface (Fun.scala:70-86): a UDF returning null where
    undefined; compose with ``.where(col.isNotNull())`` — the
    IsDefinedAt + App desugaring (traversableOps.scala:176-181)."""
    return fmap(name)

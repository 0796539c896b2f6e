"""Reader-schema compatibility checker for parquet evolution.

Answers the deployment question schema_evolution_orders (the gate that
READS drifted files) leaves open: given the schema data was WRITTEN
with and the schema a new reader wants to DECLARE, is the read safe —
before any job runs, from metadata alone.

The verdict classes come from empirically pinned Spark-on-parquet
behavior (tests/test_schema_compat.py re-verifies each against a real
write/read, so the table can never drift from the engine):

- ``ok`` / ``widened`` / ``added-null`` / ``dropped`` — safe. Spark
  fills absent nullable fields with null, ignores dropped ones, and
  widens int->long / float->double / int->double losslessly.
- ``type-incompatible`` — the read FAILS loudly (e.g. int->string,
  long->int): bad, but at least visible.
- ``silent-narrowing`` — the worst class, and the reason this checker
  exists: parquet stores small ints as physical INT32, so declaring a
  NARROWER type (int->short) does not error — values out of range
  silently WRAP (100000 reads back as -31072). No runtime signal at
  all; only a metadata check catches it.
- ``nullability-tightened`` — declaring non-null over possibly-null
  data: Spark trusts the declaration, so downstream NOT-NULL reasoning
  is built on a lie. Flagged unsafe.
- ``added-required`` — a new non-nullable field cannot be conjured
  from old files. Incompatible.
"""

from __future__ import annotations

from pyspark.sql.types import StructType

#: (written, declared) pairs Spark reads losslessly (pinned by test)
SAFE_WIDENINGS = {
    ("int", "bigint"),
    ("int", "double"),
    ("float", "double"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
}

#: narrowings the engine accepts WITHOUT error but that wrap on
#: overflow — silent corruption (pinned by test)
SILENT_NARROWINGS = {
    ("int", "smallint"),
    ("int", "tinyint"),
    ("smallint", "tinyint"),
}


def reader_compatibility(written: StructType, declared: StructType) -> dict:
    """Classify reading ``written``-schema parquet under ``declared``.

    Returns ``{"compatible": bool, "findings": [(class, field), ...]}``
    where findings list every non-``ok`` field; ``compatible`` is False
    iff any finding is one of the unsafe classes.
    """
    unsafe = {
        "silent-narrowing",
        "type-incompatible",
        "added-required",
        "nullability-tightened",
    }
    old = {f.name: f for f in written.fields}
    findings: list[tuple[str, str]] = []
    for f in declared.fields:
        if f.name not in old:
            findings.append(
                ("added-null" if f.nullable else "added-required", f.name)
            )
            continue
        o = old[f.name]
        ot, nt = o.dataType.simpleString(), f.dataType.simpleString()
        if ot != nt:
            if (ot, nt) in SAFE_WIDENINGS:
                findings.append(("widened", f.name))
            elif (ot, nt) in SILENT_NARROWINGS:
                findings.append(("silent-narrowing", f.name))
            else:
                findings.append(("type-incompatible", f.name))
        # nullability is orthogonal to the type verdict: a widened
        # column declared non-null over possibly-null data is STILL a
        # lie downstream, so this check must not sit behind the
        # type-changed branch (it used to `continue` past it)
        if o.nullable and not f.nullable:
            findings.append(("nullability-tightened", f.name))
    declared_names = {f.name for f in declared.fields}
    findings += [
        ("dropped", n) for n in old if n not in declared_names
    ]
    return {
        "compatible": not any(c in unsafe for c, _ in findings),
        "findings": sorted(findings),
    }

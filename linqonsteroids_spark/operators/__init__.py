"""Custom operators Spark lacks as built-ins, composed from DataFrame ops.

Each operator follows the catalog discipline of SURVEY.md §7.0: declare the
Spark lowering, keep everything distributed (no driver-side materialization),
and stay on the JVM/codegen path unless semantics force a Pandas UDF.
"""

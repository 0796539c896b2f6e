"""linqonsteroids_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
ps-mr/LinqOnSteroids (SQuOpt; Giarrusso et al., AOSD 2013), re-expressed
Spark-first: the DataFrame/Column API is the reification layer (the
reference's ``Exp[T]`` tree, ``Exp.scala:44-77``), Catalyst is the rewriter
(the reference's ``Optimization.scala`` pipeline), and Tungsten is codegen
(the reference's ``Compile.scala``). What we add on top:

- a fluent collection-style API mirroring the reference's operator surface
  (``linqonsteroids_spark.api``),
- an index / materialized-view repository with query rewriting — the
  reference's flagship ``Optimization.addIndex`` + ``SubquerySharing``
  capability (``linqonsteroids_spark.plans``),
- large-scale training-data-pipeline operators: dedup, similarity search,
  text analysis, multimodal plumbing (``linqonsteroids_spark.dedup``,
  ``similarity``, ``functions.text``, ``multimodal``),
- Structured Streaming incrementalization of the reference's IVM intent
  (``linqonsteroids_spark.streaming``).
"""

__version__ = "0.1.0"

from linqonsteroids_spark.session import get_spark  # noqa: F401
from linqonsteroids_spark.catalog import load_table, TABLES  # noqa: F401

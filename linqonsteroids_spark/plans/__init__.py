"""Pre-Catalyst plan layer: index / materialized-view repository + rewriting."""

from linqonsteroids_spark.plans.registry import IndexRepository  # noqa: F401

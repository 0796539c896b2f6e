"""Pre-Catalyst plan layer: index / materialized-view repository + rewriting."""

from linqonsteroids_spark.plans.combinators import (  # noqa: F401
    attempt,
    exhaust,
    first_of,
    index_substitution,
    seq,
)
from linqonsteroids_spark.plans.advisor import WorkloadAdvisor  # noqa: F401
from linqonsteroids_spark.plans.registry import IndexRepository  # noqa: F401

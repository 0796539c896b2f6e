"""Pipeline observability: named metrics collected DURING an action.

``df.observe`` attaches aggregate metrics to the plan that are computed
while the job runs — row counts, null counts, value sums for
reconciliation — so a 100 TB pipeline gets its data-quality counters
without a second pass over the input (a separate ``count()``/``agg()``
is another full scan). The listener-free collection here uses the
``Observation`` handle, which blocks until the observed action finishes
and then exposes the metric row.

Typical wash-stage use::

    obs, out = observed(df, "stage3",
                        rows=F.count(F.lit(1)),
                        null_ids=F.count_if(F.col("doc_id").isNull()))
    out.write.parquet(...)          # metrics ride along with the write
    assert obs.get["null_ids"] == 0  # reconciliation gate, zero extra scans
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[Observation, DataFrame]:
    """Attach named aggregate metrics to ``df``; returns the observation
    handle (read ``obs.get`` AFTER an action ran) and the instrumented
    DataFrame. Metrics must be aggregate expressions over df's columns."""
    if not metrics:
        raise ValueError("observed() needs at least one metric expression")
    obs = Observation(name)
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return obs, out

"""Streaming expectations: audit-before-append ingest with quarantine.

The streaming counterpart of ``operators/wap.py`` (which audits whole
staged SNAPSHOTS): continuous ingest where every micro-batch is checked
against declarative expectations and split row-wise — passing rows
append to the table, violating rows land in a QUARANTINE sink tagged
with the names of the expectations they failed. No row is dropped
silently and no violating row ever reaches the table; this is the
Delta Live Tables "expectations" pattern on plain parquet.

Mechanics and the 100 TB reading:

- All expectations evaluate in ONE projection per batch — a row's
  violation set is ``array_compact(array(when(check, NULL).otherwise(
  name), ...))``, so auditing N expectations costs one codegen'd pass
  regardless of N, and a NULL-valued check counts as a violation (the
  WAP three-valued-logic rule: a NULL price is not a positive price).
- The batch is persisted once and split by ``size(violations) == 0``
  into the two sinks — O(|batch|) work per arrival, no driver collect,
  no shuffle (both writes are narrow).
- Exactly-once on redelivery: each sink writes to a ``batch=<id>``
  subdirectory with overwrite, so a replayed micro-batch (the
  foreachBatch at-least-once contract) rewrites its own directory
  byte-identically instead of duplicating rows — the same
  deterministic-subdir idempotence the MOR streaming twin pins.
- Quarantine rows carry ``_violations`` (csv of failed expectation
  names) + ``_batch_id``: the triage query ("what failed and why,
  when") is a plain scan of the quarantine table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class StreamingExpectations:
    """``foreachBatch`` handler: audit each micro-batch row-wise and
    split it into table + quarantine appends (see module docstring)."""

    def __init__(
        self,
        checks: dict[str, Column],
        out_path: str,
        quarantine_path: str,
    ):
        if not checks:
            raise ValueError("at least one expectation is required")
        self.checks = checks
        self.out_path = out_path
        self.quarantine_path = quarantine_path

    def _mark(self, df: DataFrame) -> DataFrame:
        # when(cond, NULL).otherwise(name): NULL-valued expectations fall
        # through to the violation branch — same rule as WapTable.audit
        return df.withColumn(
            "_violations",
            F.array_compact(
                F.array(
                    *[
                        F.when(cond, F.lit(None)).otherwise(F.lit(name))
                        for name, cond in self.checks.items()
                    ]
                )
            ),
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        marked = self._mark(batch_df).persist()
        try:
            clean = marked.where(F.size("_violations") == 0).drop(
                "_violations"
            )
            clean.write.mode("overwrite").parquet(
                f"{self.out_path}/batch={batch_id}"
            )
            bad = marked.where(F.size("_violations") > 0).select(
                "*",
                F.array_join(
                    F.array_sort("_violations"), ","
                ).alias("_violated"),
            ).drop("_violations").withColumn(
                "_batch_id", F.lit(batch_id).cast("bigint")
            )
            bad.write.mode("overwrite").parquet(
                f"{self.quarantine_path}/batch={batch_id}"
            )
        finally:
            marked.unpersist()

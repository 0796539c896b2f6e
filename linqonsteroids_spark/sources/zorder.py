"""Z-order (Morton-curve) layout for multi-column data skipping.

Parquet scans prune files and row groups from min/max footer statistics,
but a layout sorted on ONE column destroys locality on every other: a
filter on the second column still reads everything. Interleaving the bits
of several columns' quantized ranks into one Morton code and sorting by it
gives every participating column bounded min/max spans per file — the
standard lakehouse layout technique (Delta/Iceberg `OPTIMIZE ZORDER BY`;
Morton 1966 — public) re-expressed as plain DataFrame ops.

Scale design (100 TB):
- Quantization bounds come from ONE tiny agg (2 values per column,
  driver-side scalars — same class as the pagerank node count); no rank
  window, no sampling nondeterminism: the code is a pure row-local
  expression, so the layout is reproducible run-to-run.
- The sort is `repartitionByRange` on the Morton code (Spark's standard
  total-order machinery) + `sortWithinPartitions` — one shuffle, the same
  budget as any single-column sort; files then inherit narrow per-column
  spans on EVERY z-ordered column.
- 16 bits per column (configurable) bounds code width: 2 cols × 16 bits =
  32-bit codes; ``zorder_code`` auto-reduces per-column bits so
  ``bits * n_cols <= 63`` (4 cols → 15 bits each) — the interleaved code
  must never reach the BIGINT sign bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: quantization resolution per column (bits).
Z_BITS = 16


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map [lo, hi] linearly onto [0, 2^bits - 1] as a bigint (degenerate
    lo == hi collapses to 0 — constant columns add no information)."""
    if hi <= lo:
        return F.lit(0).cast("bigint")
    span = hi - lo
    scaled = ((col.cast("double") - F.lit(lo)) / F.lit(span)) * ((1 << bits) - 1)
    return F.least(
        F.greatest(F.round(scaled, 0).cast("bigint"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def _interleave(cols: list[Column], bits: int) -> Column:
    """Bit-interleave quantized columns into one Morton code (row-local
    integer arithmetic — whole-stage-codegen friendly, no UDF)."""
    code = F.lit(0).cast("bigint")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(F.shiftleft(bit, b * n + i))
    return code


def zorder_code(df: DataFrame, cols: list[str], bits: int = Z_BITS) -> DataFrame:
    """Add a ``_zcode`` Morton column over ``cols`` (numeric columns).

    Auto-reduces ``bits`` so the top interleaved bit (position
    ``bits*n - 1``) stays below the BIGINT sign bit — 4 columns at the
    default 16 bits would otherwise shift into bit 63, making codes with
    that bit set negative and sort FIRST, silently breaking the Morton
    ordering the layout exists for."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder supports 1-4 columns (BIGINT code width)")
    bits = min(bits, 63 // len(cols))
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    quantized = [
        _quantize(F.col(c), bounds[f"_lo_{c}"], bounds[f"_hi_{c}"], bits)
        for c in cols
    ]
    return df.withColumn("_zcode", _interleave(quantized, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = Z_BITS,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out along the Morton curve of ``cols``:
    range-partitioned and sorted by the code, so every file's footer
    carries narrow min/max spans on EVERY z-ordered column."""
    coded = zorder_code(df, cols, bits)
    (
        coded.repartitionByRange(n_files, F.col("_zcode"))
        .sortWithinPartitions("_zcode")
        .drop("_zcode")
        .write.mode(mode)
        .parquet(path)
    )

"""Bloom-filter semi-join reduction (shuffle pruning for selective joins).

The classic distributed-join optimization (Bloom CACM'70 filters applied
to semi-join reduction, Bernstein & Chiu JACM'81; Spark itself injects
the same shape as a runtime filter under AQE): when the build side of a
join is SELECTIVE, ship a Bloom filter of its keys to the probe side and
drop probe rows that cannot match BEFORE the shuffle. Probe traffic
falls from |probe| to |true matches| + |false positives| — at 100 TB the
difference between shuffling a full fact table and shuffling only the
~1% that joins.

Design:
- The filter is a distributed (word, bits) bitmap relation (m/64 rows —
  broadcastable at ANY build-side cardinality), built with one map-side-
  combined ``bit_or`` agg; no driver-side collect of keys, no UDF.
- The probe test is k SEQUENTIAL broadcast hash joins (one per hash
  function), each followed by a row-local bit test — all inside one map
  stage, ZERO added shuffle (the existing contamination probe's
  explode + re-group shape would shuffle k×|probe| rows, defeating the
  point for a join reducer).
- 2-universal positions from two md5 halves (the contamination family):
  deterministic, engine-reproducible, no seed state.
- No false negatives by construction — the reduced join equals the
  plain join exactly (pinned by the oracle gate and pytest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bitmap size (bits) and word width; m/64 rows broadcast per filter.
BLOOM_M = 1 << 17
BLOOM_WORD = 64
#: (a, b) pairs of the 2-universal family pos = (a*h1 + b*h2) mod m.
BLOOM_COEFFS = [(3, 7), (11, 13), (17, 23), (29, 31)]


def _halves(key: Column) -> tuple[Column, Column]:
    """Two independent 32-bit hashes from one md5 of the key string."""
    s = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(s, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(s, 17, 8), 16, 10).cast("long")
    return h1, h2


def bloom_bitmap(build: DataFrame, key_col: str) -> DataFrame:
    """(word, bits) Bloom bitmap relation of the build side's keys."""
    h1, h2 = _halves(F.col(key_col))
    pos_arr = F.array(
        *[(F.lit(a) * h1 + F.lit(b) * h2) % F.lit(BLOOM_M) for a, b in BLOOM_COEFFS]
    )
    return (
        build.select(F.explode(pos_arr).alias("pos"))
        .select(
            (F.col("pos") / BLOOM_WORD).cast("long").alias("word"),
            F.expr(f"shiftleft(1L, int(pos % {BLOOM_WORD}))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_semi_reduce(
    probe: DataFrame, build: DataFrame, probe_key: str, build_key: str
) -> DataFrame:
    """Probe rows whose key passes the Bloom filter of the build side's
    keys — a SUPERSET of the true semi-join (false positives possible,
    false negatives impossible). Compose with the real join afterward:
    ``bloom_semi_reduce(fact, dim, k, k).join(dim, k)`` is exactly
    ``fact.join(dim, k)`` with shuffle traffic reduced to passes."""
    bitmap = bloom_bitmap(build, build_key)
    h1, h2 = _halves(F.col(probe_key))
    out = probe
    for i, (a, b) in enumerate(BLOOM_COEFFS):
        pos = (F.lit(a) * h1 + F.lit(b) * h2) % F.lit(BLOOM_M)
        bm = bitmap.select(
            F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        out = (
            out.withColumn(f"_p{i}", pos)
            .withColumn(f"_w{i}", (F.col(f"_p{i}") / BLOOM_WORD).cast("long"))
            .withColumn(
                f"_m{i}", F.expr(f"shiftleft(1L, int(_p{i} % {BLOOM_WORD}))")
            )
            .join(F.broadcast(bm), f"_w{i}", "left")
            .filter(
                F.col(f"_b{i}").isNotNull()
                & (F.col(f"_b{i}").bitwiseAND(F.col(f"_m{i}")) == F.col(f"_m{i}"))
            )
            .drop(f"_p{i}", f"_w{i}", f"_m{i}", f"_b{i}")
        )
    return out

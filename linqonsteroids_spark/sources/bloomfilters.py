"""Write-time Parquet bloom filters: hash-based row-group skipping.

Z-order (`sources/zorder.py`) makes min/max footer statistics useful on
a few clustered columns; this module covers the complementary case — a
point lookup on a HIGH-CARDINALITY column the layout is NOT sorted or
clustered by (the shape a time-partitioned 100 TB fact always has: the
files are date-clustered, so every file's [min, max] span on an id
column covers the whole key space and statistics prune nothing).
Parquet's split-block bloom filters (parquet-format BloomFilter spec;
Putze et al., "Cache-, Hash- and Space-Efficient Bloom Filters", JEA
2009 — public) stamp each row group with a compact hash signature at
WRITE time; at read time parquet-mr probes the signature before
touching row-group data, so an `id = ?` scan reads only the row groups
that may contain the key — no false negatives, bounded false-positive
reads — with zero layout change and no sort budget.

Scale design (100 TB):
- The filter is built streamingly by the parquet writer per row group:
  write cost is O(rows) hashing and ~100 KB per stamped column per row
  group — no extra shuffle, no extra pass, unlike Z-ORDER's total sort.
- Skipping is row-group-granular and needs NO planner support: the
  predicate reaches parquet-mr through the ordinary pushed-filter path
  (`spark.sql.parquet.filterPushdown`, on by default), so every engine
  reading the files benefits, not just Spark.
- Spark only exposes the writer knobs; verification helpers here read
  the footers back JVM-side (`ParquetFileReader.readBloomFilter`) so a
  layout job can ASSERT the filters exist before the table is promoted
  — a silent `enabled#col` typo otherwise degrades every future lookup
  back to full scans with no error anywhere.

py4j overload caveat (pinned in tests/test_sources_bloom.py): probing
an INT64 column's filter must go through parquet-mr's `hash(long)`;
py4j selects that overload only for Python ints outside 32-bit range,
and a boxed ``java.lang.Long`` resolves to the WRONG overload silently
(measured: present keys report absent). ``bloom_probe_int64`` therefore
refuses values that fit in 32 bits instead of returning wrong answers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: conservative sizing hint when the caller doesn't know the per-group NDV;
#: parquet-mr sizes the bitset from this (~131 KB at 1e5 / 1% fpp).
DEFAULT_NDV = 100_000


def write_with_bloom(
    df: DataFrame,
    path: str,
    ndv_by_col: dict[str, int],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet with a split-block bloom filter stamped on
    each column in ``ndv_by_col`` (column -> expected distinct values per
    row group; the writer sizes the bitset from it)."""
    w = df.write.mode(mode)
    for col, ndv in ndv_by_col.items():
        w = w.option(f"parquet.bloom.filter.enabled#{col}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{col}", str(int(ndv)))
    w.parquet(path)


def _open_footer_reader(spark: SparkSession, file_path: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    ipath = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path("file://" + os.path.abspath(file_path)),
        hconf,
    )
    return jvm.org.apache.parquet.hadoop.ParquetFileReader.open(ipath)


def _parquet_files(path: str) -> list[str]:
    """All data files under ``path``, RECURSIVE (hive-partitioned layouts
    keep theirs in key=value subdirectories) — and NEVER empty: a layout
    verifier that silently iterates zero files passes vacuously, the
    exact silent-degradation failure mode this module exists to stop."""
    found = []
    for root, dirs, names in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        found.extend(
            os.path.join(root, n)
            for n in names
            if n.endswith(".parquet") and not n.startswith((".", "_"))
        )
    if not found:
        raise FileNotFoundError(f"no parquet data files under {path}")
    return sorted(found)


def bloom_columns_per_file(spark: SparkSession, path: str) -> dict[str, set[str]]:
    """{file basename -> columns carrying a readable bloom filter in EVERY
    row group of that file}. Layout jobs assert against this before
    promoting a table — a column counts only if no row group missed it."""
    report: dict[str, set[str]] = {}
    for f in _parquet_files(path):
        reader = _open_footer_reader(spark, f)
        try:
            blocks = reader.getFooter().getBlocks()
            stamped: dict[str, int] = {}
            n_blocks = blocks.size()
            for bi in range(n_blocks):
                cols = blocks.get(bi).getColumns()
                for ci in range(cols.size()):
                    cc = cols.get(ci)
                    if reader.readBloomFilter(cc) is not None:
                        name = cc.getPath().toDotString()
                        stamped[name] = stamped.get(name, 0) + 1
            report[os.path.basename(f)] = {
                c for c, n in stamped.items() if n == n_blocks
            }
        finally:
            reader.close()
    return report


def bloom_probe_int64(
    spark: SparkSession, file_path: str, column: str, values: list[int]
) -> dict[int, bool]:
    """Probe ``file_path``'s first row group's bloom filter on an INT64
    ``column``: {value -> may-contain}. False is a GUARANTEED absence;
    True may be a false positive. Values must not fit in 32 bits (the
    py4j overload caveat in the module docstring)."""
    for v in values:
        if -(2**31) <= v < 2**31:
            raise ValueError(
                f"bloom_probe_int64 probe value {v} fits in 32 bits: py4j "
                "would silently select parquet-mr's hash(int) overload and "
                "probe the wrong hash; offset your key space above 2^31"
            )
    reader = _open_footer_reader(spark, file_path)
    try:
        cols = reader.getFooter().getBlocks().get(0).getColumns()
        target = None
        for ci in range(cols.size()):
            if cols.get(ci).getPath().toDotString() == column:
                target = cols.get(ci)
                break
        if target is None:
            raise ValueError(f"column {column!r} not found in {file_path}")
        bf = reader.readBloomFilter(target)
        if bf is None:
            raise ValueError(f"no bloom filter on {column!r} in {file_path}")
        return {v: bool(bf.findHash(bf.hash(v))) for v in values}
    finally:
        reader.close()


def scan_output_rows(df: DataFrame) -> int:
    """Execute ``df`` and return the FileSourceScan node's numOutputRows —
    rows surviving parquet-level pruning (row-group statistics, bloom
    filters, page indexes), BEFORE any post-scan Filter. The direct
    observable for "did the layout's skipping structures engage"."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName() == "AdaptiveSparkPlan":
        plan = plan.executedPlan()
    seen: dict[str, int] = {}

    def walk(node) -> None:
        name = node.nodeName()
        if "Scan" in name:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    # key by plan-node identity: wrappers revisit the same
                    # scan, and one query may have several scans
                    seen[f"{name}#{node.id()}"] = kv._2().value()
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        if node.children().size() == 0 and hasattr(node, "plan"):
            try:  # QueryStageExec hides its subtree behind plan()
                walk(node.plan())
            except Exception:
                pass

    walk(plan)
    if not seen:
        raise RuntimeError(f"no scan node with numOutputRows in plan: {plan}")
    return sum(seen.values())

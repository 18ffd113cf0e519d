"""Z-order (Morton-interleaved) multi-column sort for scan locality.

A parquet layout sorted lexicographically by (a, b) prunes row groups
well for filters on ``a`` but not at all for filters on ``b`` alone.
Interleaving the bits of both columns' normalized ranks gives every
prefix of the sort key information about EVERY column, so row-group
min/max statistics prune for any single-column (or conjunctive) range
filter — the standard multi-dimensional clustering trick (public: Morton
1966; used by Delta OPTIMIZE ZORDER, Iceberg sort orders).

Everything is JVM-side Catalyst expressions: the per-column
normalization is a linear min-max scale (one tiny agg pre-pass for the
bounds), the bit interleave is an unrolled shift/or expression tree that
whole-stage-codegen compiles into one pass. No UDFs.

At 100 TB: `repartitionByRange` on the z-key samples the key space, so
output files tile the z-curve; each executor sorts only its range
(sortWithinPartitions — no global sort barrier beyond the range
exchange). Skewed value distributions want quantile rather than min-max
normalization; that variant swaps one expression and is noted inline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalized_rank(df: DataFrame, col: str, bits: int) -> Column:
    """Column's value scaled linearly to [0, 2^bits) from its observed
    min/max (one agg job at build time). Uniform-ish columns only; use
    ``quantile=True`` in the callers for skewed ones."""
    lo, hi = df.agg(
        F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
    ).first()
    if lo is None or hi is None or hi == lo:
        return F.lit(0).cast("long")
    span = hi - lo
    top = (1 << bits) - 1
    scaled = ((F.col(col).cast("double") - F.lit(lo)) / F.lit(span)) * top
    return F.least(
        F.greatest(scaled.cast("long"), F.lit(0)), F.lit(top)
    )


def _quantile_rank(df: DataFrame, col: str, bits: int) -> Column:
    """Skew-robust rank: bucket index against approxQuantile boundaries,
    so each of the 2^bits ranks holds ~equal row counts no matter how
    skewed the values. One sampling pass at build time (Greenwald-Khanna
    sketch — never a sort); the lookup compiles to a binary-searchable
    CASE chain... in practice a flat `width_bucket`-style comparison sum,
    still pure codegen. bits is capped at 8 here (256 boundaries) —
    beyond that boundary-list size outgrows its value for clustering."""
    bits = min(bits, 8)
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    bounds = df.stat.approxQuantile(col, probs, 0.001)
    dedup: list[float] = []
    for b in bounds:
        if not dedup or b > dedup[-1]:
            dedup.append(b)
    if not dedup:
        return F.lit(0).cast("long")
    v = F.col(col).cast("double")
    # rank = #boundaries strictly below v — a sum of comparisons, fused
    # by codegen into one expression (no UDF, no join)
    rank = F.lit(0)
    for b in dedup:
        rank = rank + F.when(v > F.lit(b), 1).otherwise(0)
    return rank.cast("long")


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits_per_col: int = 12,
    quantile: bool = False,
) -> Column:
    """Morton key: bit i of column j lands at position i*ncols + j.
    Unrolled into a flat bitwiseOR tree (ncols*bits terms) that codegen
    fuses; 2-3 columns at 12 bits each is the practical sweet spot.
    ``quantile=True`` switches to equi-depth ranks (skewed columns)."""
    ncols = len(cols)
    if quantile:
        bits_per_col = min(bits_per_col, 8)
    rank_of = _quantile_rank if quantile else _normalized_rank
    ranks = [rank_of(df, c, bits_per_col) for c in cols]
    key = F.lit(0).cast("long")
    for j, r in enumerate(ranks):
        for i in range(bits_per_col):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 8,
    bits_per_col: int = 12,
    row_group_rows: int | None = None,
    quantile: bool = False,
) -> None:
    """Write ``df`` as parquet tiled along the z-curve of ``cols``:
    range-partition by z-key (sampled boundaries → balanced files), sort
    within each partition, drop the key before writing. Readers filter
    on ANY of ``cols`` and row-group stats prune."""
    zk = zorder_key(df, cols, bits_per_col, quantile=quantile)
    out = (
        df.withColumn("__z", zk)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    writer = out.write.mode("overwrite")
    if row_group_rows is not None:
        # small row groups for tests; production uses the 128MB default
        writer = writer.option("parquet.block.size", 64 * 1024).option(
            "parquet.page.size", 8 * 1024
        )
    writer.parquet(path)


def rowgroup_prune_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of row groups whose [min,max] for ``col`` overlaps
    [lo,hi] — what a stats-pruning reader must actually scan. Uses the
    parquet footer only (pyarrow), no Spark job."""
    import glob

    import pyarrow.parquet as pq

    total = 0
    overlapping = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                overlapping += 1
            elif not (st.max < lo or st.min > hi):
                overlapping += 1
    return overlapping / max(total, 1)

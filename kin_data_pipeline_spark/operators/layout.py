"""Z-order (Morton-curve) data layout for multi-dimensional file skipping.

Partition pruning handles ONE axis (the catalog's date partitioning); a
second selective dimension (user, domain, key range) still scans every
file of the matching dates. Ordering files along a space-filling curve
over two columns makes each file's per-column min/max a tight box, so a
2-D box predicate prunes most files from their parquet footers alone —
the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed here
with stock Spark primitives:

    z = interleave_bits(x, y)          # pure column expression, codegen'd
    df.repartitionByRange(n, z)        # one range shuffle: compact z-range
      .sortWithinPartitions(z)         #   per file → tight x AND y min/max
      .write.parquet(...)

No UDF: the interleave is a fixed fan-in of shift/mask/or terms. Inputs
must be non-negative; quantize or rank continuous values first
(``quantize`` below does a fixed-width binning that preserves range
predicates: bin bounds map to value bounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

def interleave_bits(x: Column, y: Column, bits: int = 21) -> Column:
    """Morton code: bit i of x → bit 2i, bit i of y → bit 2i+1.

    ``bits`` ≤ 31 per input (the default 21+21 fits a positive BIGINT).
    Compiles to a flat shift/or expression inside whole-stage codegen.
    """
    xl = x.cast("long")
    yl = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        # Column.__or__ is logical OR in PySpark; bitwiseOR is the integer op
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(1), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(yl, i).bitwiseAND(1), 2 * i + 1))
    return z

def quantize(col: Column, lo: float, hi: float, buckets: int = 1 << 16) -> Column:
    """Monotone fixed-width binning of a bounded numeric column into
    [0, buckets) — range predicates on the value translate to range
    predicates on the bin, which is what the curve needs."""
    scaled = (col.cast("double") - lo) / (hi - lo) * buckets
    return F.least(
        F.lit(buckets - 1),
        F.greatest(F.lit(0), F.floor(scaled)),
    ).cast("long")

def zorder_layout(
    df: DataFrame, x: Column, y: Column, n_files: int, bits: int = 21
) -> DataFrame:
    """Return ``df`` arranged so each output partition (→ parquet file)
    covers a compact Morton range over (x, y). One range shuffle; write
    the result directly (``.write.parquet``) to get the skipping layout."""
    z = interleave_bits(x, y, bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )

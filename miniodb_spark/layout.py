"""Data-layout optimization: Z-order (Morton) clustering for
multi-column parquet pruning.

Public technique (Morton 1966 interleaved coordinates; popularized for
lakehouse layout by Delta Lake's ``OPTIMIZE ZORDER BY`` and Databricks'
engineering writeups): a file sorted on ``ts`` alone prunes row groups
only for time predicates — a point lookup on ``user_id`` still scans
every file because each one spans the full id range. Interleaving the
bits of several columns' normalized ranks produces a 1-D sort key whose
contiguous ranges are small hyper-rectangles in N-D space, so parquet
footer min/max stats become selective on EVERY participating column at
once.

All pure Catalyst expressions (shiftleft/shiftright/bitwise-and inside
codegen):

1. per-column min/max via one tiny aggregate (two values per column —
   never a global sort, unlike rank-based formulations);
2. linear scale to ``bits``-wide integer grid cells;
3. bit interleave into the Morton value;
4. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` so files AND
   row groups inherit the clustering.

The scaling pass is one extra corpus scan (the min/max agg) and the
write shuffles once on the Morton key — the same cost as any sorted
write. Skew caveat: linear scaling assumes roughly uniform value
spread; heavy-tailed columns should be pre-transformed (log, bucketed)
by the caller, the same advice Delta gives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grid_cell(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale a numeric column onto [0, 2^bits) as a long. Constant
    columns (max == min) collapse to cell 0."""
    span = cmax - cmin
    scaled = F.when(
        span > 0,
        ((col.cast("double") - cmin) / span * ((1 << bits) - 1)),
    ).otherwise(F.lit(0.0))
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def morton_interleave(cells: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each cell column into one Morton
    value: output bit (i*n + j) takes bit i of cell j. Pure
    shiftleft/shiftright/& expressions — stays in whole-stage codegen."""
    n = len(cells)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, cell in enumerate(cells):
            bit = F.shiftright(cell, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_value(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Append ``_zorder`` (the Morton key over ``cols``). ``bits`` per
    column; total key width ``bits * len(cols)`` must fit a long."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows a long")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).first()
    cells = [
        _grid_cell(F.col(c), F.lit(stats[f"min_{c}"]),
                   F.lit(stats[f"max_{c}"]), bits)
        for c in cols
    ]
    return df.withColumn("_zorder", morton_interleave(cells, bits))


def zorder_write(df: DataFrame, path: str, cols: list[str],
                 bits: int = 12, num_files: int | None = None) -> None:
    """Write ``df`` Z-ordered by ``cols``: range-partition on the Morton
    key (so each output file owns a contiguous Z-range — a small
    hyper-rectangle in col-space) and sort within partitions (so row
    groups inside a file cluster too). The ``_zorder`` helper column is
    dropped from the written data."""
    z = zorder_value(df, cols, bits)
    parts = num_files or max(1, df.rdd.getNumPartitions())
    (
        z.repartitionByRange(parts, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite").parquet(path)
    )


def file_clustering_report(path: str, cols: list[str]) -> dict[str, float]:
    """Layout-quality metric from parquet footers: for each column, the
    mean per-file (max-min) width as a fraction of the global width —
    1.0 means every file spans the whole range (no pruning possible),
    small values mean footer stats are selective. Driver-side, reads
    footers only."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    per_file: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for f in files:
        meta = pq.ParquetFile(f).metadata
        lo: dict[str, float] = {}
        hi: dict[str, float] = {}
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in per_file and col.statistics is not None:
                    s = col.statistics
                    lo[name] = min(lo.get(name, float("inf")),
                                   float(s.min))
                    hi[name] = max(hi.get(name, float("-inf")),
                                   float(s.max))
        for c in cols:
            if c in lo:
                per_file[c].append((lo[c], hi[c]))
    out: dict[str, float] = {}
    for c, ranges in per_file.items():
        if not ranges:
            out[c] = 1.0
            continue
        gmin = min(r[0] for r in ranges)
        gmax = max(r[1] for r in ranges)
        width = gmax - gmin
        if width <= 0:
            out[c] = 0.0
            continue
        out[c] = sum(r[1] - r[0] for r in ranges) / (len(ranges) * width)
    return out

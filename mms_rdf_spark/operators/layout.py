"""Z-order (Morton) clustering keys for multi-dimensional data layout.

The table-layout lever the big lakehouse engines expose as `OPTIMIZE
... ZORDER BY` / Iceberg's sort-order z-curve: interleave the bits of
two order-preserving normalized dimensions so range-partitioning by the
single zkey co-locates rows that are close in BOTH dimensions. Written
that way, per-file min/max stats become tight in every z-ordered
column, so a predicate on ANY of them prunes files — the multi-dim
generalization of partition pruning, and at 100 TB the difference
between scanning 1/1000th and scanning everything for a
(user, time-range) query.

Everything is integer column arithmetic (JVM-side, codegen'd; the
DuckDB oracle mirrors it operation-for-operation): values normalize to
`bits`-bit buckets via exact BIGINT min/max scaling, then interleave
with shift/or terms. No UDFs, no floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(v: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Order-preserving normalization of a BIGINT value into
    [0, 2^bits): floor((v-min)*(2^bits - 1)/(max-min)), guarded for the
    constant-column case. The product must stay under 2^53 — i.e.
    (max-min)*(2^bits) < 2^53 — so the double division is exact and any
    engine computes the identical bucket (epoch-second spans of years
    at bits=16 are fine; widen the guard before raising bits)."""
    top = (1 << bits) - 1
    span = vmax - vmin
    return F.when(span == 0, F.lit(0)).otherwise(
        F.floor(((v - vmin) * top) / span)).cast("long")


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton interleave of two `bits`-bit values: a's bit i lands at
    2i+1, b's at 2i. A sum of shift/and/or terms — pure codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)),
                        2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)),
                        2 * i))
    return z


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16,
) -> DataFrame:
    """Adds `zkey`: the Morton interleave of the two columns after
    exact-integer min/max normalization to `bits` bits each. Columns
    must be integral (cast timestamps to epoch seconds first). The
    min/max pass is one tiny all-column aggregate broadcast back as a
    single-row frame — same scalar-stage pattern as pagerank; at scale
    you'd pin static domain bounds instead to keep it one pass."""
    clash = [c for c in df.columns
             if c in ("_amin", "_amax", "_bmin", "_bmax", "zkey")]
    if clash:
        raise ValueError(f"zorder_key: input columns {clash} collide "
                         "with reserved internal names; rename first")
    bounds = df.agg(
        F.min(F.col(col_a).cast("long")).alias("_amin"),
        F.max(F.col(col_a).cast("long")).alias("_amax"),
        F.min(F.col(col_b).cast("long")).alias("_bmin"),
        F.max(F.col(col_b).cast("long")).alias("_bmax"))
    with_b = df.crossJoin(F.broadcast(bounds))
    a = _bucket(F.col(col_a).cast("long"), F.col("_amin"),
                F.col("_amax"), bits)
    b = _bucket(F.col(col_b).cast("long"), F.col("_bmin"),
                F.col("_bmax"), bits)
    return with_b.select(
        *df.columns, _interleave(a, b, bits).alias("zkey"))


def cluster_by_zorder(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort by the z-key: the write-side layout op.
    Each output file then covers a compact z-curve segment, i.e. a
    small rectangle in (a, b) space — tight min/max on BOTH columns,
    so scans filtered on either prune most files."""
    z = zorder_key(df, col_a, col_b, bits)
    if num_partitions:
        z = z.repartitionByRange(num_partitions, "zkey")
    else:
        z = z.repartitionByRange("zkey")
    return z.sortWithinPartitions("zkey")


def hilbert_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16,
) -> DataFrame:
    """Adds `hkey`: the Hilbert-curve index of the two columns after
    the same exact-integer min/max normalization as `zorder_key`.
    Hilbert beats Morton on locality — CONSECUTIVE curve positions are
    always grid-adjacent (no Z-shaped jumps across the space), so
    range-partitioned files cover even tighter rectangles; it is the
    curve Iceberg/Delta expose next to z-order for exactly that
    reason. Cost: `bits` unrolled rotate/flip stages instead of one
    interleave — still pure integer column math, no UDFs.

    The per-step state (x, y, d) is carried as materialized projection
    columns, one chained select per step: each intermediate is
    referenced several times by the next step, which keeps Catalyst's
    CollapseProject from inlining the chain into an exponentially
    duplicated expression tree, and the whole ladder still fuses into
    a single WholeStageCodegen span. The DuckDB oracle
    (events_hilbert) walks the same ladder as chained CTEs —
    integer-exact, engine-identical.
    """
    clash = [c for c in df.columns
             if c in ("_amin", "_amax", "_bmin", "_bmax",
                      "_hx", "_hy", "_hd", "_rx", "_ry", "hkey")]
    if clash:
        raise ValueError(f"hilbert_key: input columns {clash} collide "
                         "with reserved internal names; rename first")
    bounds = df.agg(
        F.min(F.col(col_a).cast("long")).alias("_amin"),
        F.max(F.col(col_a).cast("long")).alias("_amax"),
        F.min(F.col(col_b).cast("long")).alias("_bmin"),
        F.max(F.col(col_b).cast("long")).alias("_bmax"))
    with_b = df.crossJoin(F.broadcast(bounds))
    a = _bucket(F.col(col_a).cast("long"), F.col("_amin"),
                F.col("_amax"), bits)
    b = _bucket(F.col(col_b).cast("long"), F.col("_bmin"),
                F.col("_bmax"), bits)
    cur = with_b.select(*df.columns, a.alias("_hx"), b.alias("_hy"),
                        F.lit(0).cast("long").alias("_hd"))
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0,
                    F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0,
                    F.lit(1)).otherwise(F.lit(0)).cast("long")
        cur = cur.select(*df.columns, "_hx", "_hy", "_hd",
                         rx.alias("_rx"), ry.alias("_ry"))
        d2 = (F.col("_hd")
              + F.lit(s) * F.lit(s)
              * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")))
        flipx = F.when(F.col("_rx") == 1,
                       F.lit(s - 1) - F.col("_hx")).otherwise(
            F.col("_hx"))
        flipy = F.when(F.col("_rx") == 1,
                       F.lit(s - 1) - F.col("_hy")).otherwise(
            F.col("_hy"))
        nx = F.when(F.col("_ry") == 0, flipy).otherwise(F.col("_hx"))
        ny = F.when(F.col("_ry") == 0, flipx).otherwise(F.col("_hy"))
        cur = cur.select(*df.columns, nx.alias("_hx"),
                         ny.alias("_hy"), d2.alias("_hd"))
    return cur.select(*df.columns, F.col("_hd").alias("hkey"))


def cluster_by_hilbert(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition + sort by the Hilbert key — `cluster_by_zorder`
    with the tighter curve."""
    h = hilbert_key(df, col_a, col_b, bits)
    if num_partitions:
        h = h.repartitionByRange(num_partitions, "hkey")
    else:
        h = h.repartitionByRange("hkey")
    return h.sortWithinPartitions("hkey")

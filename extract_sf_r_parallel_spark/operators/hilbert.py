"""Hilbert-curve clustering — the second space-filling-curve LAYOUT
operator next to Z-order (operators/zorder.py). The Hilbert curve
never jumps: consecutive codes are always 4-adjacent cells, so
per-file bboxes after clustering are tighter than Morton's (Morton
teleports across the map at every power-of-two boundary — the classic
"Z seam"). That tighter locality is why table formats offer both.

The standard xy2d walk (public domain, the Wikipedia/Hamilton
formulation) is a per-level fold: at scale s, the quadrant index
(3·rx) XOR ry advances the code by s²·quadrant, then the frame
rotates (flip + swap) so the child quadrant is re-oriented. The fold
is sequential PER ROW but constant-depth (`bits` levels), so the
engine unrolls it into `bits` chained integer projections — pure JVM
Column arithmetic, zero UDFs, and the exact same unroll emits as
chained SQL CTEs for the DuckDB oracle (xor / & / CASE agree
bit-for-bit across engines).

Quantization mirrors zorder_code exactly: (CAST(x AS BIGINT)·2^bits)
div extent — integer math, no float rounding to disagree on.

Scale notes (100 TB): identical profile to Z-order — the code is a
row-local projection, clustering is one repartitionByRange + sorted
write; only the curve (and therefore the pruning quality) changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_hilbert_code", "hilbert_sql", "cluster_by_hilbert"]


def with_hilbert_code(df: DataFrame, x: str = "x", y: str = "y",
                      extent: float = 20000.0, bits: int = 8,
                      out: str = "hd") -> DataFrame:
    """Add the Hilbert code of (x, y) on a 2^bits × 2^bits grid over
    [0, extent)² as column `out`. Unrolled fold: `bits` chained
    projections over working columns (_hx, _hy, code accumulator) —
    a DataFrame-in/DataFrame-out shape because each level's frame
    rotation feeds the next (a single Column expression would nest
    exponentially)."""
    s0 = 1 << bits
    e = int(extent)
    work = df.withColumns({
        "_hx": F.expr(f"(CAST({x} AS BIGINT) * {s0}) div {e}"),
        "_hy": F.expr(f"(CAST({y} AS BIGINT) * {s0}) div {e}"),
        out: F.lit(0).cast("long"),
    })
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        # materialize rx/ry as real columns each level: they're
        # referenced 3× below, which keeps CollapseProject from
        # inlining the fold into one exponentially-nested expression
        # (the naive inline version measured ~6× slower end-to-end)
        work = work.withColumns({
            "_rx": F.expr(f"CASE WHEN (_hx & {s}) > 0 THEN 1 ELSE 0 END"),
            "_ry": F.expr(f"CASE WHEN (_hy & {s}) > 0 THEN 1 ELSE 0 END"),
        })
        work = work.withColumns({
            out: F.expr(f"{out} + {s * s} * ((3 * _rx) ^ _ry)"),
            "_hx": F.expr(
                f"CASE WHEN _ry = 0 THEN "
                f"(CASE WHEN _rx = 1 THEN {s - 1} - _hy ELSE _hy END) "
                f"ELSE _hx END"),
            "_hy": F.expr(
                f"CASE WHEN _ry = 0 THEN "
                f"(CASE WHEN _rx = 1 THEN {s - 1} - _hx ELSE _hx END) "
                f"ELSE _hy END"),
        })
    return work.drop("_hx", "_hy", "_rx", "_ry")


def hilbert_sql(x: str, y: str, extent: float = 20000.0,
                bits: int = 8, keys: str = "x, y") -> str:
    """The DuckDB replay of with_hilbert_code as a chained-CTE SQL
    fragment: `WITH h{bits} AS (...), ..., h0 AS (...)` — select from
    `h0`, which carries `keys` plus the final `hd`. Same unroll, same
    integer ops, so every code matches bit-for-bit. `keys` must be an
    explicit column list (never `*` — the working columns _hx/_hy/hd
    would collide with themselves at every level)."""
    if "*" in keys:
        raise ValueError("hilbert_sql: keys must list columns "
                         "explicitly ('*' collides with the working "
                         "columns at every level)")
    s0 = 1 << bits
    e = int(extent)
    parts = [f"""h{bits} AS (
  SELECT {keys},
         (CAST({x} AS BIGINT) * {s0}) // {e} AS _hx,
         (CAST({y} AS BIGINT) * {s0}) // {e} AS _hy,
         CAST(0 AS BIGINT) AS hd
  FROM __hilbert_src
)"""]
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        rx = f"(CASE WHEN (_hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (_hy & {s}) > 0 THEN 1 ELSE 0 END)"
        parts.append(f""", h{lvl} AS (
  SELECT {keys},
         CASE WHEN {ry} = 0 THEN
           (CASE WHEN {rx} = 1 THEN {s - 1} - _hy ELSE _hy END)
         ELSE _hx END AS _hx,
         CASE WHEN {ry} = 0 THEN
           (CASE WHEN {rx} = 1 THEN {s - 1} - _hx ELSE _hx END)
         ELSE _hy END AS _hy,
         hd + {s * s} * xor(3 * {rx}, {ry}) AS hd
  FROM h{lvl + 1}
)""")
    return "".join(parts)


def cluster_by_hilbert(df: DataFrame, x: str = "x", y: str = "y",
                       n_partitions: int = 32,
                       extent: float = 20000.0, bits: int = 8,
                       out: str = "hd") -> DataFrame:
    """Physically cluster on the Hilbert code: range-partition + sort
    within partitions, same contract as cluster_by_zorder — every
    output partition covers a contiguous curve range, which on the
    Hilbert curve is a CONNECTED region (no Z seam)."""
    return (with_hilbert_code(df, x, y, extent, bits, out)
            .repartitionByRange(n_partitions, F.col(out))
            .sortWithinPartitions(out))

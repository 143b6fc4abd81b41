"""Geohash encoding — the third spatial LAYOUT/index code next to
Z-order (operators/zorder.py) and Hilbert (operators/hilbert.py), and
the one with a human-shareable string form: 5 bits per base32
character, longitude-first bit interleave, so every shared prefix is a
nested cell (prefix aggregation = multi-resolution rollup for free).

Same quantization discipline as the other curve codes: integer-only
((CAST(x AS BIGINT)·2^bits) div extent — no float rounding for two
engines to disagree on), and the bit interleave + base32 lookup are
plain integer/substr expressions that evaluate bit-identically in
Spark SQL and DuckDB (`geohash_code_sql` emits the shared text, with
the one dialect difference — `div` vs `//` — parameterized).

Reference parity: the reference's fishnet cells (C_…R:232-253) are its
only spatial index; geohash is the standard public equivalent for
lat/lon-keyed tables. Scale: row-local projection, zero shuffles;
prefix groupBy is one ordinary aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["GEOHASH_ALPHABET", "geohash_code_sql", "with_geohash"]

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_code_sql(x: str, y: str, extent: float = 20000.0,
                     bits: int = 15, div: str = "div") -> str:
    """The interleaved integer code as one SQL expression: x (the
    longitude axis) contributes the even bit positions from the MSB,
    y the odd — the standard geohash order. 2·bits total bits
    (bits=15 → 30 bits → 6 base32 chars)."""
    e = int(extent)
    s0 = 1 << bits
    qx = f"((CAST({x} AS BIGINT) * {s0}) {div} {e})"
    qy = f"((CAST({y} AS BIGINT) * {s0}) {div} {e})"
    terms = []
    for m in range(bits):
        terms.append(f"((({qx} >> {bits - 1 - m}) & 1) << {2*bits - 1 - 2*m})")
        terms.append(f"((({qy} >> {bits - 1 - m}) & 1) << {2*bits - 2 - 2*m})")
    return "(" + " + ".join(terms) + ")"


def geohash_chars_sql(code: str, precision: int = 6,
                      total_bits: int = 30) -> str:
    """base32 rendering of an integer geohash `code` expression
    (reference it via a materialized column/CTE — inlining the full
    code expression here would repeat it `precision` times)."""
    parts = [
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST((({code} >> {total_bits - 5 * (k + 1)}) & 31) AS INT) + 1, 1)"
        for k in range(precision)
    ]
    return " || ".join(parts)


def with_geohash(df: DataFrame, x: str = "x", y: str = "y",
                 extent: float = 20000.0, precision: int = 6,
                 out: str = "gh") -> DataFrame:
    """Add the `precision`-char geohash of (x, y) over [0, extent)².
    The integer code is materialized once (_ghc) so the char lookups
    reference a column, not six copies of the 30-term interleave."""
    if (5 * precision) % 2:
        raise ValueError("use an even precision: 5·p bits must split "
                         "evenly over the two axes")
    bits = 5 * precision // 2
    work = df.withColumn(
        "_ghc", F.expr(geohash_code_sql(x, y, extent, bits, div="div")))
    return work.withColumn(
        out, F.expr(geohash_chars_sql("_ghc", precision, 2 * bits))
    ).drop("_ghc")

"""Deterministic geotagging — the graft's stand-in for the reference's
point-count coordinates (x.alb10tm/y.alb10tm, C_…R:23-25) and for the
polygon layers' placement.

Two families:

1. **Engine geotag** (`splitmix64`, `geotag_xy`): hashes string ids to
   planar metres inside the fixture window. Used for the image table
   (FIXTURES.md §1 "derived" block). NumPy-only, runs inside pandas
   UDFs.

2. **SQL-parity geotag** (`sql_point_x` …): *integer* LCG arithmetic
   expressed as an ANSI-SQL snippet string that parses identically in
   Spark SQL and DuckDB. This lets the driver's DuckDB oracle check the
   engine's *spatial* joins exactly: the oracle brute-forces the join
   from the same deterministic coordinates while Spark runs the real
   cell-indexed plan. Integer-valued coordinates make every distance a
   sqrt of an exact integer → bit-identical across engines, and every
   rectangle-overlap area an exact integer → order-insensitive sums.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "WINDOW", "X_LO", "Y_LO",
    "splitmix64", "geotag_xy", "geotag_year",
    "sql_point_x", "sql_point_y", "sql_point_year",
    "sql_rect", "RECT_COLS",
]

# fixture window: 20 km × 20 km sub-window of the reference extent
# (C_…R:209-213), offset chosen inside it
X_LO = 400000.0
Y_LO = 6000000.0
WINDOW = 20000  # metres


# ---------------------------------------------------------------------------
# engine geotag (string ids → metres), NumPy
# ---------------------------------------------------------------------------

def splitmix64(v: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64."""
    v = v.astype(np.uint64)
    v = (v + np.uint64(0x9E3779B97F4A7C15))
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return v ^ (v >> np.uint64(31))


def _fnv64(strings) -> np.ndarray:
    """Vector FNV-1a over an iterable of strings → uint64."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):  # short ids; cost negligible vs geometry
        h = np.uint64(0xCBF29CE484222325)
        for ch in s.encode():
            h = (h ^ np.uint64(ch)) * np.uint64(0x100000001B3)
        out[i] = h
    return out


def geotag_xy(ids) -> tuple[np.ndarray, np.ndarray]:
    """image_id strings → (x, y) metres inside the fixture window."""
    with np.errstate(over="ignore"):
        h = splitmix64(_fnv64(ids))
        hx = h & np.uint64(0xFFFFFFFF)
        hy = h >> np.uint64(32)
    x = X_LO + (hx % np.uint64(WINDOW * 100)).astype(np.float64) / 100.0
    y = Y_LO + (hy % np.uint64(WINDOW * 100)).astype(np.float64) / 100.0
    return x, y


def geotag_year(phash: np.ndarray) -> np.ndarray:
    """phash → survey YEAR (FIXTURES.md: 1993 + (phash mod 30))."""
    return (1993 + np.abs(np.asarray(phash, dtype=np.int64)) % 30).astype(np.int32)


# ---------------------------------------------------------------------------
# SQL-parity geotag (integer key column → integer metres), ANSI SQL text
# ---------------------------------------------------------------------------

# Lehmer-style mixing with small-enough products for signed-64 safety
# (max key ~1e7 × 69621 ≪ 2^63; DuckDB raises on BIGINT overflow, so the
# constants are deliberately small).
_P1, _P2 = 999983, 999979
_A1, _A2 = 48271, 69621


def sql_point_x(key: str) -> str:
    return f"CAST((({key} * {_A1} + 13) % {_P1}) % {WINDOW} AS DOUBLE)"


def sql_point_y(key: str) -> str:
    return f"CAST((({key} * {_A2} + 7) % {_P2}) % {WINDOW} AS DOUBLE)"


def sql_point_year(key: str) -> str:
    return f"CAST(1997 + ({key} % 25) AS INT)"


def sql_lon(key: str) -> str:
    """Deterministic lon degrees in [-121, -109) around the reference
    CRS's central meridian (lon0 = -115, C_…R:33). Integer LCG + one
    IEEE division — bit-identical across engines."""
    return f"(-121.0 + CAST((({key} * {_A1} + 13) % {_P1}) % 12001 AS DOUBLE) / 1000.0)"


def sql_lat(key: str) -> str:
    """Deterministic lat degrees in [49, 60) (the reference extent's
    latitude band)."""
    return f"(49.0 + CAST((({key} * {_A2} + 7) % {_P2}) % 11001 AS DOUBLE) / 1000.0)"


RECT_COLS = ("rxmin", "rymin", "rxmax", "rymax", "ryear")


def rect_params_np(keys: np.ndarray) -> dict[str, np.ndarray]:
    """NumPy twin of :func:`sql_rect` — identical integer arithmetic,
    used by fixture writers (e.g. the shapefile round-trip layer) so a
    binary-format read-back can be hash-checked against the SQL."""
    k = np.asarray(keys, dtype=np.int64)
    cx = ((k * _A1 + 101) % _P1) % WINDOW
    cy = ((k * _A2 + 211) % _P2) % WINDOW
    hw = 5 + (k % 37) * 3
    hh = 5 + (k % 41) * 2
    return {
        "rxmin": (cx - hw).astype(np.float64),
        "rymin": (cy - hh).astype(np.float64),
        "rxmax": (cx + hw).astype(np.float64),
        "rymax": (cy + hh).astype(np.float64),
        "ryear": np.where(k % 20 == 0, 0, 1990 + (k % 29)).astype(np.int64),
    }


def sql_rect(key: str) -> dict[str, str]:
    """Axis-aligned rectangle derived from an integer key column:
    centre via the LCG above, half-extents 5..116 m, YEAR with the
    reference's 0-sentinel on every 20th feature (C_…R:150, 231)."""
    cx = f"((({key} * {_A1} + 101) % {_P1}) % {WINDOW})"
    cy = f"((({key} * {_A2} + 211) % {_P2}) % {WINDOW})"
    hw = f"(5 + ({key} % 37) * 3)"
    hh = f"(5 + ({key} % 41) * 2)"
    return {
        "rxmin": f"CAST({cx} - {hw} AS DOUBLE)",
        "rymin": f"CAST({cy} - {hh} AS DOUBLE)",
        "rxmax": f"CAST({cx} + {hw} AS DOUBLE)",
        "rymax": f"CAST({cy} + {hh} AS DOUBLE)",
        "ryear": f"CAST(CASE WHEN {key} % 20 = 0 THEN 0 ELSE 1990 + ({key} % 29) END AS INT)",
    }

"""CRS reprojection as a pipeline stage (st_transform on load,
/root/reference/1_scripts/C_…R:33 and 14 repeats; D_…R:81).

The reference reprojects EVERY layer to the planar 10TM CRS before any
geometry work. The engine equivalent: `project_points` /
`project_layer` apply the transverse-Mercator forward series
(geo/kernels.tmerc_forward, GRS80, pure NumPy — no pyproj) inside
Arrow-batched pandas UDFs, so lon/lat inputs enter the same planar
(x, y) world all spatial operators run in. `unproject_points` is the
inverse (round-trip tested to <1 mm).

Scale shape: a scalar pandas UDF per batch — no shuffle, no state; at
100 TB this fuses into the scan projection like any narrow map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import kernels as K

__all__ = ["project_points", "project_layer", "unproject_points", "TMERC_10TM"]

# the reference CRS: "+proj=tmerc +lat_0=0 +lon_0=-115 +k=0.9992
# +x_0=500000 +y_0=0 +ellps=GRS80 +units=m" (C_…R:33)
TMERC_10TM = {"lon0": -115.0, "k0": 0.9992, "x0": 500000.0, "y0": 0.0}


def _xy_struct():
    return T.StructType([
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ])


def project_points(df: DataFrame, lon: str = "lon", lat: str = "lat",
                   x: str = "x", y: str = "y", **crs) -> DataFrame:
    """Add planar (x, y) metre columns from lon/lat degree columns."""
    params = {**TMERC_10TM, **crs}

    @F.pandas_udf(returnType=_xy_struct())
    def _fwd(lo: pd.Series, la: pd.Series) -> pd.DataFrame:
        px, py = K.tmerc_forward(lo.to_numpy(np.float64),
                                 la.to_numpy(np.float64), **params)
        return pd.DataFrame({"x": px, "y": py})

    d = df.withColumn("_xy", _fwd(F.col(lon), F.col(lat)))
    return (d.withColumn(x, F.col("_xy.x"))
             .withColumn(y, F.col("_xy.y")).drop("_xy"))


def unproject_points(df: DataFrame, x: str = "x", y: str = "y",
                     lon: str = "lon", lat: str = "lat", **crs) -> DataFrame:
    """Inverse: planar (x, y) metres → lon/lat degrees."""
    params = {**TMERC_10TM, **crs}
    schema = T.StructType([
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ])

    @F.pandas_udf(returnType=schema)
    def _inv(px: pd.Series, py: pd.Series) -> pd.DataFrame:
        lo, la = K.tmerc_inverse(px.to_numpy(np.float64),
                                 py.to_numpy(np.float64), **params)
        return pd.DataFrame({"lon": lo, "lat": la})

    d = df.withColumn("_ll", _inv(F.col(x), F.col(y)))
    return (d.withColumn(lon, F.col("_ll.lon"))
             .withColumn(lat, F.col("_ll.lat")).drop("_ll"))


def project_layer(polys: DataFrame, geom: str = "geom", **crs) -> DataFrame:
    """Reproject every ring vertex of a geometry column (the layer-load
    st_transform, C_…R:33): rings arrive as array<array<double>> of
    flat lon,lat pairs and leave as planar metre pairs."""
    params = {**TMERC_10TM, **crs}
    rtype = T.ArrayType(T.ArrayType(T.DoubleType()))

    @F.pandas_udf(returnType=rtype)
    def _proj(g: pd.Series) -> pd.Series:
        out = []
        for rings in g:
            nrings = []
            for ring in rings:
                v = np.asarray(ring, np.float64).reshape(-1, 2)
                px, py = K.tmerc_forward(v[:, 0], v[:, 1], **params)
                nrings.append(np.column_stack([px, py]).ravel().tolist())
            out.append(nrings)
        return pd.Series(out)

    return polys.withColumn(geom, _proj(F.col(geom)))

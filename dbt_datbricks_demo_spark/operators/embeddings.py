"""Grouped-map embedding analytics via applyInPandas.

Most embedding math in this engine stays in JVM expressions (dots,
norms, buckets — see similarity.py). This module covers the genuinely
imperative per-group case: spectral analysis of a group's embedding
cloud (top principal direction + explained variance), which needs the
whole group as a matrix and an eigensolver — not expressible as
DataFrame operations.

applyInPandas semantics & scale: one shuffle on the group key, then each
group materializes as ONE pandas DataFrame in a Python worker — so
groups must fit in worker memory (labels/clusters: fine; do NOT group by
a near-unique key). Output is a single narrow row per group."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

PRINCIPAL_SCHEMA = StructType(
    [
        StructField("group", LongType()),
        StructField("n_vectors", IntegerType()),
        StructField("explained_var_ratio", DoubleType()),
        StructField("principal_direction", ArrayType(DoubleType())),
    ]
)


def per_group_principal_direction(
    df: DataFrame, group_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per group: the top principal component of the centered embedding
    matrix and its explained-variance ratio. Sign is fixed (first nonzero
    coordinate positive) so results are deterministic."""

    def principal(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        group = int(pdf[group_col].iloc[0])
        n = mat.shape[0]
        if n < 2:
            return pd.DataFrame(
                {
                    "group": [group],
                    "n_vectors": [n],
                    "explained_var_ratio": [1.0],
                    "principal_direction": [mat[0].tolist() if n else []],
                }
            )
        centered = mat - mat.mean(axis=0)
        # eigh on the dim×dim covariance: deterministic, no SVD sign noise
        cov = centered.T @ centered / (n - 1)
        vals, vecs = np.linalg.eigh(cov)
        top = vecs[:, -1]
        nz = np.flatnonzero(np.abs(top) > 1e-12)
        if len(nz) and top[nz[0]] < 0:
            top = -top
        total = float(vals.sum())
        ratio = float(vals[-1] / total) if total > 0 else 0.0
        return pd.DataFrame(
            {
                "group": [group],
                "n_vectors": [n],
                "explained_var_ratio": [ratio],
                "principal_direction": [top.tolist()],
            }
        )

    return (
        df.select(group_col, vec_col)
        .groupBy(group_col)
        .applyInPandas(principal, PRINCIPAL_SCHEMA)
    )

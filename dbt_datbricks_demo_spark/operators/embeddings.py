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
a near-unique key). Output is a single narrow row per group.

Verification (tolerance-mode oracle, round 6): no SQL engine can run
the eigensolver, but the eigenPAIR is certifiable by its defining
properties. Each group row carries booleans the DuckDB oracle pins to
literal TRUE — computed from the same covariance matrix the solver
consumed, so a wrong eigenvector/eigenvalue cannot hash-match:

- unit_norm_ok       |‖v‖₂ − 1| ≤ 1e-9 (orthonormality of the returned
                     column of eigh)
- eigen_residual_ok  ‖Cov·v − λ·v‖₂ ≤ 1e-8 · max(λ, trace·1e-12, ε) —
                     the eigen-equation itself
- lambda_is_top_ok   λ ≥ max(diag(Cov)) − tol: the TOP eigenvalue
                     dominates every coordinate variance (a solver that
                     returned a non-extremal eigenpair — e.g. vals[0]
                     instead of vals[-1] — fails this on any
                     anisotropic cloud)
- ratio_in_unit_ok   0 ≤ explained_var_ratio ≤ 1 and λ ≤ trace + tol
- sign_ok            first |coord| > 1e-12 of v is positive (the
                     documented determinism convention)

The exact columns (group, n_vectors) hash-compare against DuckDB's
count(*). Degenerate groups (n < 2: no covariance) emit all-TRUE by
definition, matching the oracle's unconditional TRUE."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
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
        StructField("unit_norm_ok", BooleanType()),
        StructField("eigen_residual_ok", BooleanType()),
        StructField("lambda_is_top_ok", BooleanType()),
        StructField("ratio_in_unit_ok", BooleanType()),
        StructField("sign_ok", BooleanType()),
    ]
)

_RESIDUAL_RTOL = 1e-8
_NORM_ATOL = 1e-9


def per_group_principal_direction(
    df: DataFrame, group_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per group: the top principal component of the centered embedding
    matrix, its explained-variance ratio, and the certification booleans
    documented in the module docstring. Sign is fixed (first nonzero
    coordinate positive) so results are deterministic."""

    def principal(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        group = int(pdf[group_col].iloc[0])
        n = mat.shape[0]

        def row(ratio, direction, checks=(True,) * 5):
            return pd.DataFrame(
                {
                    "group": [group],
                    "n_vectors": [n],
                    "explained_var_ratio": [ratio],
                    "principal_direction": [direction],
                    "unit_norm_ok": [bool(checks[0])],
                    "eigen_residual_ok": [bool(checks[1])],
                    "lambda_is_top_ok": [bool(checks[2])],
                    "ratio_in_unit_ok": [bool(checks[3])],
                    "sign_ok": [bool(checks[4])],
                }
            )

        if n < 2:
            # no covariance exists: certified vacuously (oracle emits
            # unconditional TRUE, so the convention must match)
            return row(1.0, mat[0].tolist() if n else [])
        centered = mat - mat.mean(axis=0)
        # eigh on the dim×dim covariance: deterministic, no SVD sign noise
        cov = centered.T @ centered / (n - 1)
        vals, vecs = np.linalg.eigh(cov)
        lam = float(vals[-1])
        top = vecs[:, -1]
        nz = np.flatnonzero(np.abs(top) > 1e-12)
        if len(nz) and top[nz[0]] < 0:
            top = -top
        trace = float(np.trace(cov))
        ratio = float(lam / trace) if trace > 0 else 0.0
        # certification: the eigenpair's defining properties, computed
        # against the SAME covariance the solver consumed
        scale = max(abs(lam), trace * 1e-12, 1e-300)
        unit_norm_ok = abs(float(np.linalg.norm(top)) - 1.0) <= _NORM_ATOL
        residual = float(np.linalg.norm(cov @ top - lam * top))
        eigen_residual_ok = residual <= _RESIDUAL_RTOL * scale
        lambda_is_top_ok = lam >= float(np.max(np.diag(cov))) - (
            _RESIDUAL_RTOL * scale + 1e-300
        )
        ratio_in_unit_ok = (
            0.0 <= ratio <= 1.0 and lam <= trace + _RESIDUAL_RTOL * scale
        )
        sign_ok = (len(nz) == 0) or bool(top[nz[0]] > 0)
        return row(
            ratio,
            top.tolist(),
            (
                unit_norm_ok,
                eigen_residual_ok,
                lambda_is_top_ok,
                ratio_in_unit_ok,
                sign_ok,
            ),
        )

    return (
        df.select(group_col, vec_col)
        .groupBy(group_col)
        .applyInPandas(principal, PRINCIPAL_SCHEMA)
    )

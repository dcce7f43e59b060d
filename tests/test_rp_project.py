"""Unit tests for the Johnson–Lindenstrauss random projection
(operators/similarity.py::rp_project)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_rp_project_basis_vector_reads_matrix_column(spark):
    from edgar_spark.operators.similarity import _hyperplanes, rp_project

    dim, k = 16, 4
    planes = _hyperplanes(dim, k)
    basis = np.zeros(dim, dtype=np.float32)
    basis[3] = 1.0
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [7], "embedding": [basis.tolist()]})
    )
    (row,) = rp_project(df, dim=dim, k=k).collect()
    expected = [round(float(planes[j][3]), 6) for j in range(k)]
    assert [round(p, 6) for p in row["proj"]] == expected


def test_rp_project_deterministic_under_repartition(spark):
    from edgar_spark.operators.similarity import rp_project

    rng = np.random.RandomState(5)
    vecs = rng.rand(20, 8).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(20), "embedding": [v.tolist() for v in vecs]}
        )
    )
    a = {r["vec_id"]: r["proj"] for r in rp_project(df, dim=8, k=3).collect()}
    b = {
        r["vec_id"]: r["proj"]
        for r in rp_project(df.repartition(7), dim=8, k=3).collect()
    }
    assert a == b
    assert all(len(p) == 3 for p in a.values())

"""Unit tests for the perceptual average-hash over real BMP decode
(operators/multimodal.py::image_ahash)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _media(spark, imgs: list):
    from edgar_spark.operators.multimodal import encode_bmp

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": range(len(imgs)),
                "payload": [encode_bmp(i) for i in imgs],
            }
        )
    )


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_image_ahash_noise_robust_and_discriminative(spark):
    from edgar_spark.operators.multimodal import image_ahash

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    # small noise: perturb a few pixels slightly -> few cells flip
    noisy = base.copy()
    noisy[0, 0] = np.clip(noisy[0, 0].astype(int) + 5, 0, 255)
    other = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    rows = {
        r["media_id"]: r["ahash"]
        for r in image_ahash(_media(spark, [base, noisy, other])).collect()
    }
    d_near = _hamming(rows[0], rows[1])
    d_far = _hamming(rows[0], rows[2])
    assert d_near <= 3
    assert d_far > d_near


def test_image_ahash_dims_contract(spark):
    from edgar_spark.operators.multimodal import image_ahash

    odd = np.zeros((5, 8, 3), dtype=np.uint8)  # height not /8
    df = _media(spark, [odd])
    (row,) = image_ahash(df, strict=False).collect()
    assert row["ahash"] is None
    with pytest.raises(Exception):
        image_ahash(df, strict=True).collect()


def test_image_ahash_matches_direct_pixel_computation(spark):
    from edgar_spark.operators.multimodal import image_ahash

    img = np.arange(8 * 8 * 3, dtype=np.uint64).reshape(8, 8, 3)
    img = (img % 256).astype(np.uint8)
    (row,) = image_ahash(_media(spark, [img])).collect()
    luma = img.astype(int).sum(axis=2).flatten()
    total = luma.sum()
    expect = np.uint64(0)
    for i in range(64):
        if luma[i] * 64 >= total:
            expect |= np.uint64(1) << np.uint64(i)
    assert row["ahash"] == int(expect.astype(np.int64))

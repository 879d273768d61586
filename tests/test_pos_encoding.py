"""Positional encodings vs the reference formulas (utils.py:16-94),
recomputed independently here with numpy slice-assignment semantics."""
import math

import numpy as np

from paths_tpu.ops.pos_encoding import (
    positional_encoding_1d,
    positional_encoding_2d_from_pos,
    positional_encoding_2d_grid,
)


def ref_pe_1d(length, dim, k=10000.0):
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-math.log(k) / dim))
    pe = np.zeros((length, dim))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def ref_pe_2d_from_pos(xpos, ypos, dim, k=10000.0):
    n = xpos.shape[0]
    div = np.exp(np.arange(0, dim // 2, 2) * (-math.log(k) / dim))[None]
    x = xpos[:, None]
    y = ypos[:, None]
    pe = np.zeros((n, dim))
    pe[:, 0:dim // 2:2] = np.sin(x * div)
    pe[:, 1:dim // 2:2] = np.cos(x * div)
    pe[:, dim // 2::2] = np.sin(y * div)
    pe[:, dim // 2 + 1::2] = np.cos(y * div)
    return pe


def test_pe_1d_matches_reference():
    for length, dim in [(7, 8), (33, 128), (1, 192), (5, 64)]:
        ours = np.asarray(positional_encoding_1d(length, dim))
        ref = ref_pe_1d(length, dim)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pe_2d_from_pos_matches_reference():
    rng = np.random.default_rng(0)
    for n, dim in [(11, 128), (4, 192), (1, 64)]:
        xpos = rng.integers(0, 500, n).astype(np.float64)
        ypos = rng.integers(0, 500, n).astype(np.float64)
        ours = np.asarray(positional_encoding_2d_from_pos(xpos, ypos, dim))
        ref = ref_pe_2d_from_pos(xpos, ypos, dim)
        # positions up to 500: f32 sin/cos argument error dominates
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_pe_2d_grid_matches_pointwise():
    n, m, dim = 5, 7, 64
    grid = np.asarray(positional_encoding_2d_grid(n, m, dim))
    a = np.repeat(np.arange(n), m).astype(np.float64)
    b = np.tile(np.arange(m), n).astype(np.float64)
    pts = np.asarray(positional_encoding_2d_from_pos(a, b, dim)).reshape(n, m, dim)
    np.testing.assert_allclose(grid, pts, atol=1e-6)


def test_pe_2d_batched_shape():
    xpos = np.zeros((2, 3))
    ypos = np.ones((2, 3))
    out = positional_encoding_2d_from_pos(xpos, ypos, 32)
    assert out.shape == (2, 3, 32)

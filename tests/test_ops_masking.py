"""Unit tests for masking primitives."""
import jax.numpy as jnp
import numpy as np

from paths_tpu.ops.masking import length_mask, masked_mean, masked_topk


def test_length_mask():
    m = np.asarray(length_mask(jnp.array([0, 2, 3]), 3))
    np.testing.assert_array_equal(
        m, [[False, False, False], [True, True, False], [True, True, True]])


def test_masked_topk_respects_mask():
    vals = jnp.array([[0.9, 0.1, 0.8, 0.7]])
    mask = jnp.array([[False, True, True, True]])
    idx, valid = masked_topk(vals, mask, 2)
    np.testing.assert_array_equal(np.asarray(idx), [[2, 3]])
    assert np.asarray(valid).all()


def test_masked_topk_valid_marks_shortfall():
    vals = jnp.array([[0.5, 0.4, 0.3]])
    mask = jnp.array([[True, False, False]])
    idx, valid = masked_topk(vals, mask, 3)
    np.testing.assert_array_equal(np.asarray(valid), [[True, False, False]])
    assert int(idx[0, 0]) == 0


def test_masked_topk_tie_lowest_index():
    vals = jnp.array([[0.5, 0.5, 0.5]])
    mask = jnp.ones((1, 3), bool)
    idx, _ = masked_topk(vals, mask, 2)
    np.testing.assert_array_equal(np.asarray(idx), [[0, 1]])


def test_masked_mean():
    vals = jnp.array([[1.0, 2.0, 100.0]])
    mask = jnp.array([[True, True, False]])
    assert float(masked_mean(vals, mask, axis=1)[0]) == 1.5
    # empty mask -> 0
    assert float(masked_mean(vals, jnp.zeros((1, 3), bool), axis=1)[0]) == 0.0

"""Pallas masked flash attention vs the XLA reference (interpreter mode on
CPU; the same kernel compiles for TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paths_tpu.kernels.flash_attention as fa


@pytest.fixture(autouse=True)
def interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _rand(b, h, n, d, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, h, n, d)).astype(np.float32)
    k = rng.normal(size=(b, h, n, d)).astype(np.float32)
    v = rng.normal(size=(b, h, n, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_matches_reference_full_lengths():
    q, k, v = _rand(2, 2, 256, 32)
    lengths = jnp.array([256, 256])
    out = fa.masked_flash_attention(q, k, v, lengths)
    ref = fa._attn_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_reference_masked():
    q, k, v = _rand(3, 2, 256, 32, seed=1)
    lengths = jnp.array([256, 100, 1])
    out = fa.masked_flash_attention(q, k, v, lengths)
    ref = fa._attn_reference(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_non_multiple_length():
    """Sequence not a multiple of the block size gets padded internally."""
    q, k, v = _rand(1, 2, 200, 32, seed=2)
    lengths = jnp.array([130])
    out = fa.masked_flash_attention(q, k, v, lengths)
    ref = fa._attn_reference(q, k, v, lengths)
    assert out.shape == (1, 2, 200, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_gradient_ragged_batch():
    """Pallas backward kernels vs XLA reference grads, ragged lengths,
    non-block-multiple sequence."""
    q, k, v = _rand(3, 2, 200, 32, seed=7)
    lengths = jnp.array([200, 130, 1])

    def loss_flash(q, k, v):
        return jnp.sum(fa.masked_flash_attention(q, k, v, lengths) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(fa._attn_reference(q, k, v, lengths) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   rtol=1e-4)


def test_flash_gradient_via_reference_vjp():
    q, k, v = _rand(1, 1, 128, 16, seed=3)
    lengths = jnp.array([90])

    def loss_flash(q, k, v):
        return jnp.sum(fa.masked_flash_attention(q, k, v, lengths) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(fa._attn_reference(q, k, v, lengths) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_mha_pallas_impl_matches_xla():
    """mha_apply(impl='pallas') == mha_apply(impl='xla') for prefix masks."""
    from paths_tpu.nn.attention import mha_apply, mha_init

    params = mha_init(jax.random.PRNGKey(0), 32, 4)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 130, 32)).astype(np.float32))
    valid = jnp.arange(130)[None, :] < jnp.array([130, 57])[:, None]

    out_x = mha_apply(params, x, x, x, key_valid=valid, impl="xla")
    out_p = mha_apply(params, x, x, x, key_valid=valid, impl="pallas")
    # compare only valid rows; padded-query rows are garbage by contract
    m = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(out_p)[m], np.asarray(out_x)[m],
                               atol=3e-5)

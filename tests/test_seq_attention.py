"""Sequence-parallel flash attention (gathered-KV shard_map) vs the
single-device kernel and the XLA reference, on the 8-virtual-device CPU
mesh with the Pallas interpreter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paths_tpu.kernels.flash_attention as fa
from paths_tpu.ops.masking import NEG_INF
from paths_tpu.parallel.seq_attention import seq_sharded_flash_attention
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture(autouse=True)
def interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def reference_attention(q, k, v, lengths):
    b, h, n, d = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    mask = jnp.arange(k.shape[2])[None] < lengths[:, None]
    s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("model",))


def _case(b=2, h=2, n=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (rng.normal(size=(b, h, n, d)).astype(np.float32)
               for _ in range(3))
    lengths = np.asarray([n, n - 19], np.int32)   # ragged valid prefixes
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths)


def _shard(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P(None, None, "model", None)))


def test_seq_sharded_matches_reference():
    mesh = _mesh()
    q, k, v, lengths = _case()
    ref = reference_attention(q, k, v, lengths)
    out = seq_sharded_flash_attention(
        mesh, _shard(mesh, q), _shard(mesh, k), _shard(mesh, v), lengths,
        block_q=8, block_k=8)
    # padded-query rows (beyond lengths) may differ; compare valid rows
    for bi, ln in enumerate(np.asarray(lengths)):
        np.testing.assert_allclose(np.asarray(out)[bi, :, :ln],
                                   np.asarray(ref)[bi, :, :ln], atol=2e-5)


def test_seq_sharded_gradients_match():
    """d(weighted sum of valid outputs)/d(q,k,v) matches the unsharded
    kernel — the all-gather's reduce-scatter backward included."""
    mesh = _mesh()
    q, k, v, lengths = _case(seed=3)
    w = jnp.asarray(np.random.default_rng(9).normal(size=q.shape)
                    .astype(np.float32))
    valid = (jnp.arange(q.shape[2])[None] < lengths[:, None])[:, None, :,
                                                              None]
    wv = jnp.where(valid, w, 0.0)

    def loss_single(q, k, v):
        return jnp.sum(fa.masked_flash_attention(q, k, v, lengths, 8, 8)
                       * wv)

    def loss_sharded(q, k, v):
        return jnp.sum(seq_sharded_flash_attention(
            mesh, q, k, v, lengths, block_q=8, block_k=8) * wv)

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_sharded, argnums=(0, 1, 2))(
        _shard(mesh, q), _shard(mesh, k), _shard(mesh, v))
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_ring_matches_reference():
    """Ring schedule (O(N/sp) memory): forward matches the dense XLA
    reference on valid rows, including ragged lengths whose valid prefix
    ends mid-ring (batch 1's 45 valid keys span shards 0-5 of 8)."""
    from paths_tpu.parallel.seq_attention import ring_flash_attention

    mesh = _mesh()
    q, k, v, lengths = _case()
    ref = reference_attention(q, k, v, lengths)
    out = ring_flash_attention(
        mesh, _shard(mesh, q), _shard(mesh, k), _shard(mesh, v), lengths,
        block_q=8, block_k=8)
    for bi, ln in enumerate(np.asarray(lengths)):
        np.testing.assert_allclose(np.asarray(out)[bi, :, :ln],
                                   np.asarray(ref)[bi, :, :ln], atol=2e-5)


def test_ring_matches_gathered():
    """Ring and gathered-KV paths agree everywhere (same kernel math,
    different schedule)."""
    from paths_tpu.parallel.seq_attention import ring_flash_attention

    mesh = _mesh()
    q, k, v, lengths = _case(seed=7)
    qs, ks, vs = _shard(mesh, q), _shard(mesh, k), _shard(mesh, v)
    a = seq_sharded_flash_attention(mesh, qs, ks, vs, lengths,
                                    block_q=8, block_k=8)
    b = ring_flash_attention(mesh, qs, ks, vs, lengths,
                             block_q=8, block_k=8)
    for bi, ln in enumerate(np.asarray(lengths)):
        np.testing.assert_allclose(np.asarray(b)[bi, :, :ln],
                                   np.asarray(a)[bi, :, :ln], atol=2e-5)


def test_ring_gradients_match():
    """Ring backward (rotating dk/dv accumulators) vs the unsharded
    kernel's gradients."""
    import jax.numpy as jnp

    from paths_tpu.parallel.seq_attention import ring_flash_attention

    mesh = _mesh()
    q, k, v, lengths = _case(seed=11)
    w = jnp.asarray(np.random.default_rng(5).normal(size=q.shape)
                    .astype(np.float32))
    valid = (jnp.arange(q.shape[2])[None] < lengths[:, None])[:, None, :,
                                                              None]
    wv = jnp.where(valid, w, 0.0)

    def loss_single(q, k, v):
        return jnp.sum(fa.masked_flash_attention(q, k, v, lengths, 8, 8)
                       * wv)

    def loss_ring(q, k, v):
        return jnp.sum(ring_flash_attention(
            mesh, q, k, v, lengths, block_q=8, block_k=8) * wv)

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_ring, argnums=(0, 1, 2))(
        _shard(mesh, q), _shard(mesh, k), _shard(mesh, v))
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_ring_bfloat16():
    """bf16 inputs: the ring scan's f32 (out, lse) carry must not
    mismatch (regression: zeros_like(q) init crashed the scan), and the
    result matches the f32 reference to bf16 tolerance."""
    import jax.numpy as jnp

    from paths_tpu.parallel.seq_attention import ring_flash_attention

    mesh = _mesh()
    q, k, v, lengths = _case(seed=13)
    ref = reference_attention(q, k, v, lengths)
    qb, kb, vb = (jnp.asarray(a, jnp.bfloat16) for a in (q, k, v))
    out = ring_flash_attention(
        mesh, _shard(mesh, qb), _shard(mesh, kb), _shard(mesh, vb), lengths,
        block_q=8, block_k=8)
    assert out.dtype == jnp.bfloat16
    for bi, ln in enumerate(np.asarray(lengths)):
        np.testing.assert_allclose(
            np.asarray(out, np.float32)[bi, :, :ln],
            np.asarray(ref)[bi, :, :ln], atol=5e-2)

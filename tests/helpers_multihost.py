"""Worker process for the two-host distributed smoke test.

Launched by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set and 4 virtual CPU devices per
process. Initializes `jax.distributed` through
`runtime.maybe_init_distributed`, builds a global 8-device data-parallel
mesh spanning both processes, assembles the global batch from
process-local shards, runs ONE full train step (forward + backward +
AdamW with the cross-process gradient all-reduce), and prints the loss.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_default_matmul_precision", "highest")

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

# per-worker cache dir: a SHARED cache makes compile times asymmetric
# (one worker compiles cold while the other loads the first's entry), and
# gloo's rendezvous at the first collective has a fixed ~30s window — the
# faster worker times out waiting. Symmetric caches keep the skew small.
_cache = os.path.join(_repo, ".jax_cache_tests",
                      f"mh_worker_{os.environ.get('JAX_PROCESS_ID', '0')}")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from paths_tpu.runtime import maybe_init_distributed

    assert maybe_init_distributed(), "coordinator env vars missing"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    # Establish the cross-process gloo context NOW with a trivial global
    # all-reduce (symmetric ~1s compile on both workers), so the big
    # train-step program later reuses it instead of racing the ~30s
    # rendezvous window after asymmetric compiles.
    from jax.experimental.multihost_utils import sync_global_devices

    sync_global_devices("paths_tpu_multihost_warmup")

    import __graft_entry__ as g
    from paths_tpu.parallel.mesh import replicate, shard_train_batch
    from paths_tpu.train.loop import make_optimizer, make_step_fns

    # identical on both processes (seeded synthesis). Shrunk model widths:
    # this test's coverage is the cross-process gloo collectives and the
    # production staging path, which are width-independent — flagship dims
    # only inflate the per-worker CPU compile (~2x suite-dominating cost)
    cfg, params_h, bag0_h, tables_h, labels_h = g._flagship(
        num_levels=3, level0_hw=(2, 3), b=8,
        model_overrides=dict(patch_embed_dim=64, trans_dim=16, trans_heads=2,
                             trans_layers=1, importance_mlp_hidden_dim=16,
                             hierarchical_ctx_mlp_hidden_dim=32))
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))

    def to_global(tree, spec):
        def put(x):
            sharding = NamedSharding(mesh, spec)
            local = np.asarray(x)
            if spec:  # batch-sharded: this process owns a row slice
                per = local.shape[0] // jax.process_count()
                pid = jax.process_index()
                local = local[pid * per:(pid + 1) * per]
            return jax.make_array_from_process_local_data(sharding, local)

        return jax.tree_util.tree_map(put, tree)

    tx = make_optimizer(cfg)
    params = to_global(params_h, P())
    opt_state = tx.init(params)
    bag0, tables, labels = to_global((bag0_h, tables_h, labels_h), P("data"))

    update, _ = make_step_fns(cfg, tx)
    # AOT-compile BEFORE executing: each worker compiles the big step
    # independently (minutes of skew on a loaded single-core host), but
    # gloo arms its ~30s rendezvous windows at execution start. Compile
    # first, then barrier, then execute — post-barrier skew is tiny, so
    # every in-program rendezvous is tightly aligned on both workers.
    rng = jax.random.PRNGKey(0)
    compiled = update.lower(params, opt_state, bag0, tables, labels,
                            rng).compile()
    sync_global_devices("paths_tpu_multihost_compiled")
    params, opt_state, loss, _ = compiled(params, opt_state, bag0, tables,
                                          labels, rng)
    jax.block_until_ready(loss)
    assert bool(jax.numpy.isfinite(loss)), loss

    # the PRODUCTION staging path: train_loop stages batches with plain
    # device_put (replicate / shard_train_batch), which must form the
    # same global arrays cross-process as the explicit
    # make_array_from_process_local_data assembly above — same compiled
    # step, identical loss. (params/opt were donated; rebuild.)
    params2 = replicate(mesh, params_h)
    opt2 = tx.init(params2)
    bag2, tab2, lab2 = shard_train_batch(mesh, bag0_h, tables_h, labels_h)
    _, _, loss2, _ = compiled(params2, opt2, bag2, tab2, lab2, rng)
    jax.block_until_ready(loss2)
    assert float(loss2) == float(loss), (float(loss2), float(loss))
    print(f"MULTIHOST_LOSS={float(loss):.6f}")


if __name__ == "__main__":
    main()

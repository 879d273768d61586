"""The training loop.

Mirrors the reference (`train.py:31-116`): AdamW + per-epoch exponential
LR decay, per-batch end-to-end hierarchical forward/backward, periodic
validation with optional best-val early stopping, checkpoint resume from
`train_stats["epoch"]`, final test evaluation.

TPU-shaped: the update is ONE jitted program (forward through all levels,
backward, optimizer) consuming a batch sharded along the `data` mesh axis
with replicated params — XLA inserts the gradient all-reduce. Batches are
padded to the mesh size with zero-weighted duplicates so every shard sees
identical static shapes.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import numpy as np
import optax

from paths_tpu.config import Config
from paths_tpu.data.dataset import SlideDataset, collate_batch, union_pads
from paths_tpu.engine.hierarchy import end2end_loss
from paths_tpu.models.recursive import recursive_init
from paths_tpu.parallel.mesh import (
    data_axis_size,
    mesh_from_config,
    pad_batch_indices,
    replicate,
    seq_axis_size,
    shard_batch,
    shard_train_batch,
)
from paths_tpu.train.evaluators import make_evaluator
from paths_tpu.train.logging import MetricsLogger
from paths_tpu.train.state import load_state, save_state


def make_train_rng(config: Config, offset: int = 1):
    """Seeded typed PRNG key for training randomness; impl per
    `config.prng_impl` ("auto" = rbg on TPU — the fast counter RNG —
    threefry elsewhere, keeping CPU test trajectories byte-stable)."""
    impl = getattr(config, "prng_impl", "auto")
    if impl == "auto":
        try:
            on_tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")
        except Exception:  # noqa: BLE001 — backend probing must never raise
            on_tpu = False
        impl = "rbg" if on_tpu else "threefry2x32"
    return jax.random.key(config.seed + offset, impl=impl)


def make_optimizer(config: Config):
    """AdamW with injected (per-epoch mutable) learning rate — torch
    AdamW + ExponentialLR semantics (`train.py:49-50`, `config.py:130-131`).
    Optional global grad-norm clipping via `config.clip_grad_norm`."""
    if config.clip_grad_norm:
        opt = optax.inject_hyperparams(
            lambda learning_rate, weight_decay, max_norm: optax.chain(
                optax.clip_by_global_norm(max_norm),
                optax.adamw(learning_rate, weight_decay=weight_decay)))(
            learning_rate=config.lr, weight_decay=config.weight_decay,
            max_norm=config.clip_grad_norm)
        return opt
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=config.lr, weight_decay=config.weight_decay)


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jax.numpy.asarray(lr)
    return opt_state


def make_step_fns(config: Config, tx, mesh=None):
    """(update_fn, eval_fn), both jittable.

    When `mesh` carries a `model` axis of size > 1, the mesh is threaded
    into the model so attention can route to the sequence-parallel
    shard_map kernel (engaged by `attention_impl` "auto"/"pallas" —
    under "xla", GSPMD partitions the attention natively and the mesh
    is unused)."""
    if seq_axis_size(mesh) > 1:
        from paths_tpu.parallel.seq_attention import SeqSharding

        seq_mesh = SeqSharding(mesh, impl=config.seq_attention)
    else:
        seq_mesh = None

    @partial(jax.jit, donate_argnums=(0, 1))
    def update(params, opt_state, bag0, tables, labels, rng, epoch=None):
        if epoch is not None:
            # per-epoch exponential LR decay folded into the step (torch
            # ExponentialLR semantics, `config.py:130-131`): no host-side
            # opt-state write between epochs
            opt_state.hyperparams["learning_rate"] = (
                config.lr * config.lr_decay_per_epoch ** (epoch - 1.0))

        def lf(p):
            return end2end_loss(p, config, bag0, tables, labels, rng=rng,
                                deterministic=False, seq_mesh=seq_mesh)

        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    @jax.jit
    def evaluate(params, bag0, tables, labels):
        return end2end_loss(params, config, bag0, tables, labels,
                            deterministic=True, seq_mesh=seq_mesh)

    return update, evaluate


def _prefetch(iterator, depth: int = 2):
    """Run `iterator` in a background thread with a bounded queue so host
    collation (grid scans, padding, H2D staging) overlaps device compute.
    Exceptions propagate to the consumer. If the consumer abandons the
    generator early (exception mid-epoch, generator close), a cancel
    event unblocks the producer's `q.put` so the thread exits instead of
    holding staged buffers forever."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    END = object()
    cancelled = threading.Event()

    def put(item) -> bool:
        while not cancelled.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not put(item):
                    return
            put(END)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            put(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        cancelled.set()


def _epoch_batches(dataset: SlideDataset, batch_size: int, *, shuffle: bool,
                   seed: int, mesh_size: int, config: Config,
                   prefetch: int = 2, pads=None, mesh=None):
    """Yield (bag0, tables, labels, weights) with mesh-size padding,
    prefetched on a background thread. Under static shapes (`pads`), the
    final partial batch also pads up to the full batch width so every
    batch compiles to ONE program — otherwise the last batch of each
    split is a second multi-minute remote compile of the big step.

    With a multi-device `mesh`, collation places the big arrays
    `data`-sharded straight from the host (each chip's slice crosses its
    own link, issued from the prefetch thread) instead of landing whole
    on one device and resharding over ICI; the caller's
    `shard_train_batch` is then a no-op re-put for the data axis."""
    target = (-(-batch_size // mesh_size) * mesh_size if pads is not None
              else mesh_size)
    put = None
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec("data"))
        put = lambda a: jax.device_put(np.asarray(a), sharding)  # noqa: E731

    def gen():
        order = np.arange(len(dataset))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for s in range(0, len(order), batch_size):
            idx = order[s: s + batch_size].tolist()
            idx, w = pad_batch_indices(idx, target)
            bag0, tables, labels = collate_batch(
                dataset, idx, level0_bucket=config.level0_bucket, pads=pads,
                put=put)
            labels = dict(labels)
            labels["weight"] = jax.numpy.asarray(w)
            yield bag0, tables, labels, w

    if prefetch:
        yield from _prefetch(gen(), depth=prefetch)
    else:
        yield from gen()


def _epoch_batches_streaming(dataset: SlideDataset, batch_size: int, *,
                             shuffle: bool, seed: int, mesh_size: int,
                             config: Config, mesh=None, prefetch: int = 2,
                             pads=None):
    """Streaming-engine batches: level-0 bag on device (sharded over the
    mesh), per-slide host table dicts for the deeper levels (tables never
    leave host RAM). A background thread loads/collates batch k+1 — the
    mmap table loads and level-0 collation overlap the device's selection
    and replay passes for batch k. On a 2-D (data x model) mesh the
    level-0 patch axis is sharded along `model` (sequence parallelism —
    the StreamingEngine routes attention accordingly)."""
    from paths_tpu.data.dataset import collate_bag0
    from paths_tpu.parallel.mesh import shard_bag_patches

    # static shapes: pad the final partial batch to the full batch width
    # (same single-program contract as _epoch_batches)
    target = (-(-batch_size // mesh_size) * mesh_size if pads is not None
              else mesh_size)

    def gen():
        order = np.arange(len(dataset))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for s in range(0, len(order), batch_size):
            idx = order[s: s + batch_size].tolist()
            idx, w = pad_batch_indices(idx, target)
            bag0 = collate_bag0(dataset, idx,
                                level0_bucket=config.level0_bucket,
                                pads=pads)
            slides = [dataset.slides[i] for i in idx]
            host_tables = [s_.tables for s_ in slides]
            labels = dict(dataset.labels(idx))
            labels = {k: jax.numpy.asarray(v) for k, v in labels.items()}
            labels["weight"] = jax.numpy.asarray(w)
            if mesh is not None and mesh.devices.size > 1:
                if seq_axis_size(mesh) > 1:
                    bag0 = shard_bag_patches(mesh, bag0)
                    labels = shard_batch(mesh, labels)
                else:
                    bag0, labels = shard_batch(mesh, (bag0, labels))
            yield bag0, host_tables, labels, w, slides

    if prefetch:
        yield from _prefetch(gen(), depth=prefetch)
    else:
        yield from gen()


def train_loop(config: Config, model_dir: str, train_ds: SlideDataset,
               val_ds: Optional[SlideDataset], test_ds: SlideDataset,
               logger: Optional[MetricsLogger] = None,
               mesh=None, verbose: bool = True) -> dict:
    log = logger or MetricsLogger(model_dir, config.to_dict(), use_wandb="no")
    mesh = mesh or mesh_from_config(config)
    # batches are padded to (and sharded over) the DATA axis; a 2-D mesh's
    # `model` axis shards each slide's patch dimension instead
    mesh_size = data_axis_size(mesh)

    engine = config.engine
    if engine == "auto":
        # price the fused engine's HBM residency from the full-shape scan
        # (engine/auto.py); the same pads then drive static collation
        from paths_tpu.engine.auto import resolve_engine

        auto_pads = union_pads(*(d.global_pads() for d in
                                 [train_ds, val_ds, test_ds]
                                 if d is not None))
        engine = resolve_engine(config, auto_pads, config.batch_size[0],
                                verbose=verbose)
    streaming = engine == "streaming"

    # one compiled shape per program across the whole run (train + both
    # eval splits share the same padded shapes). The streaming engine only
    # pads the level-0 bag (its deeper tables stay host-side), so its
    # global-pads pass touches one grid per slide.
    pads = None
    if config.static_shapes:
        if config.engine == "auto":
            pads = auto_pads   # full pads superset; streaming reads n0
        else:
            pads = union_pads(*(d.global_pads(level0_only=streaming)
                                for d in [train_ds, val_ds, test_ds]
                                if d is not None))

    params = recursive_init(jax.random.PRNGKey(config.seed), config)
    tx = make_optimizer(config)
    opt_state = tx.init(params)

    params, opt_state, train_stats = load_state(model_dir, params, opt_state,
                                                config=config)
    start_epoch = train_stats["epoch"]
    metric = "c-index" if config.task == "survival" else "AUC"
    for key in ["train_loss", f"train_{metric}", "val_loss", f"val_{metric}"]:
        train_stats.setdefault(key, {})

    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    update, evaluate = make_step_fns(config, tx, mesh=mesh)

    if streaming:
        from paths_tpu.engine.streaming import StreamingEngine

        eng = StreamingEngine(config, mesh=mesh)

        @jax.jit
        def opt_apply(grads, opt_state, params):
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

    batch_size = config.batch_size[0]
    rng = make_train_rng(config)
    best_val_score = -1.0

    def _register(evaluator, labels, pred, loss, w):
        n_real = int(w.sum())
        host_labels = {k: np.asarray(v)[:n_real] for k, v in labels.items()}
        evaluator.register(host_labels, np.asarray(pred)[:n_real], float(loss))

    class _DeferredRegister:
        """Register batch k's (device-resident) outputs only when batch
        k+1's are pushed: materializing loss/pred forces a device sync,
        and doing it one step late lets the host dispatch the next step
        first so the device queue never drains (the sync then overlaps
        compute instead of serializing with it — significant on
        high-dispatch-latency links)."""

        def __init__(self, evaluator):
            self.ev = evaluator
            self.pending = None

        def push(self, labels, pred, loss, w):
            self.flush()
            self.pending = (labels, pred, loss, w)

        def flush(self):
            if self.pending is not None:
                _register(self.ev, *self.pending)
                self.pending = None

    eval_batch_cache: dict = {}   # id(dataset) -> device-resident batches

    def _eval_batches(dataset, cacheable):
        """Eval batches are identical every pass (no shuffle, global
        pads); `cache_eval_batches` keeps the VAL split's device-resident
        so later eval epochs skip collation + the feature H2D entirely
        (the `evaluate` jit does not donate its inputs). The test split
        runs once, so caching it would materialize every test batch in
        HBM simultaneously for zero reuse — it stays lazy."""
        key = id(dataset)
        cacheable = cacheable and config.cache_eval_batches
        if cacheable and key in eval_batch_cache:
            return eval_batch_cache[key]

        def gen():
            for bag0, tables, labels, w in _epoch_batches(
                    dataset, batch_size, shuffle=False, seed=0,
                    mesh_size=mesh_size, config=config, pads=pads,
                    mesh=mesh):
                bag0, tables, labels = shard_train_batch(mesh, bag0,
                                                         tables, labels)
                yield bag0, tables, labels, w

        if not cacheable:
            return gen()   # lazy: one batch's buffers live at a time
        eval_batch_cache[key] = list(gen())
        return eval_batch_cache[key]

    def _streaming_eval_batches(dataset, cacheable):
        """Streaming counterpart of `_eval_batches`: caches the DEVICE
        side of each eval batch — the collated level-0 bag (the per-batch
        H2D that dominates eval cost on slow links) plus labels/weights —
        keyed by dataset. Host tables are NOT cached as arrays: the slide
        objects re-materialize them from the store's mmaps on access, so
        the cache holds ~bag-sized HBM, not store-sized host RAM. The
        per-level gathered lookups still ship fresh each pass (they
        depend on the live params' selections)."""
        key = id(dataset)
        cacheable = cacheable and config.cache_eval_batches
        cached = eval_batch_cache.get(key) if cacheable else None
        if cached is not None:
            for bag0, labels, w, slides in cached:
                yield bag0, [s_.tables for s_ in slides], labels, w, slides
            return
        fresh = []
        for bag0, host_tables, labels, w, slides in _epoch_batches_streaming(
                dataset, batch_size, shuffle=False, seed=0,
                mesh_size=mesh_size, config=config, mesh=mesh, pads=pads):
            if cacheable:
                fresh.append((bag0, labels, w, slides))
            yield bag0, host_tables, labels, w, slides
        if cacheable:
            eval_batch_cache[key] = fresh

    def run_eval(dataset, evaluator, cacheable=False):
        reg = _DeferredRegister(evaluator)
        if streaming:
            for bag0, host_tables, labels, w, slides in \
                    _streaming_eval_batches(dataset, cacheable):
                loss, pred = eng.evaluate(params, bag0, host_tables, labels)
                reg.push(labels, pred, loss, w)
                if not dataset.cache_slides:
                    for s_ in slides:
                        s_.unload()
            reg.flush()
            return
        for bag0, tables, labels, w in _eval_batches(dataset, cacheable):
            loss, aux = evaluate(params, bag0, tables, labels)
            reg.push(labels, aux["pred"], loss, w)
        reg.flush()

    if verbose:
        print(f"Training starts at epoch {start_epoch} "
              f"(mesh: {mesh_size} device(s))")

    train_eval = make_evaluator(config, "train")
    val_eval = make_evaluator(config, "val")

    for e in range(start_epoch, config.num_epochs + 1):
        t0 = time.time()
        epoch_arr = jax.numpy.asarray(float(e))
        if streaming:
            # the streaming opt_apply has no epoch input; set LR host-side
            opt_state = set_lr(opt_state,
                               config.lr * config.lr_decay_per_epoch**(e - 1))
        reg = _DeferredRegister(train_eval)

        if streaming:
            for bag0, host_tables, labels, w, slides in _epoch_batches_streaming(
                    train_ds, batch_size, shuffle=True,
                    seed=config.seed * 100_003 + e, mesh_size=mesh_size,
                    config=config, mesh=mesh, pads=pads):
                rng, step_rng = jax.random.split(rng)
                loss, pred, grads = eng.loss_and_grad(
                    params, bag0, host_tables, labels, rng=step_rng,
                    deterministic=False)
                params, opt_state = opt_apply(grads, opt_state, params)
                reg.push(labels, pred, loss, w)
                if not train_ds.cache_slides:
                    for s_ in slides:
                        s_.unload()
        else:
            for bag0, tables, labels, w in _epoch_batches(
                    train_ds, batch_size, shuffle=True,
                    seed=config.seed * 100_003 + e, mesh_size=mesh_size,
                    config=config, pads=pads, mesh=mesh):
                rng, step_rng = jax.random.split(rng)
                bag0, tables, labels = shard_train_batch(mesh, bag0, tables,
                                                         labels)
                params, opt_state, loss, aux = update(
                    params, opt_state, bag0, tables, labels, step_rng,
                    epoch_arr)
                reg.push(labels, aux["pred"], loss, w)

        reg.flush()
        log.log(train_eval.calculate(train_stats, e) | {"epoch": e})
        train_eval.reset()
        # standing run telemetry (the epoch-scale soak's evidence that
        # wall/epoch and host RAM stay bounded — the axon client leaks
        # host RAM ~= bytes ever device_put, so long runs must show it)
        from paths_tpu.profiling import host_rss_mb

        train_stats.setdefault("epoch_wall_s", {})[e] = round(
            time.time() - t0, 2)
        rss = host_rss_mb()
        if rss is not None:
            train_stats.setdefault("host_rss_mb", {})[e] = rss
        if verbose:
            print(f"Epoch {e}/{config.num_epochs} "
                  f"({time.time() - t0:.1f}s, rss {rss or 0:.0f}MB) "
                  f"train_loss={train_stats['train_loss'].get(e, float('nan')):.4f}")

        # periodic checkpoint (the reference declares `save_epochs` but
        # never uses it, `train.py`; honoring it gives long runs crash
        # resumability). Disabled under early stopping, where the saved
        # checkpoint must remain the best-val one.
        if (config.save_epochs and e % config.save_epochs == 0
                and not config.early_stopping):
            train_stats["epoch"] = e + 1
            save_state(model_dir, params, opt_state, train_stats,
                       backend=config.checkpoint_backend)

        if e % config.eval_epochs == 0 and val_ds is not None and len(val_ds):
            run_eval(val_ds, val_eval, cacheable=True)
            log_dict = val_eval.calculate(train_stats, e) | {"epoch": e}
            log.log(log_dict)
            val_eval.reset()
            val_score = log_dict[f"val_{metric}"]
            if (config.early_stopping and val_score > best_val_score
                    and e >= config.min_epochs):
                best_val_score = val_score
                train_stats["epoch"] = e + 1
                save_state(model_dir, params, opt_state, train_stats,
                       backend=config.checkpoint_backend)

    if config.early_stopping:
        params, opt_state, s = load_state(model_dir, params, opt_state,
                                          config=config)
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        if verbose:
            print(f"Early stopping: loading from epoch {s['epoch']}")

    train_stats["epoch"] = config.num_epochs
    save_state(model_dir, params, opt_state, train_stats,
                       backend=config.checkpoint_backend)

    test_eval = make_evaluator(config, "test")
    run_eval(test_ds, test_eval)
    log.log(test_eval.calculate(train_stats) | {"epoch": config.num_epochs})
    log.finish()
    return train_stats

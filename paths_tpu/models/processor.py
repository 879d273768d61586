"""PATHS processor: the per-magnification-level module.

Pure-function equivalent of the reference `PATHSProcessor`
(`model/paths.py:17-146`). One processor exists per hierarchy level; all
levels share a single LSTM cell (passed in as `lstm_params`).

Per-level computation (`model/paths.py:66-146`):
  1. LSTM: thread per-patch hierarchical context; Y = X + h
  2. importance alpha = sigmoid(MLP(Y)), exactly 0 on padding
  3. Z = Y * alpha  (importance_mode="mul" — this is what makes top-K
     selection learnable)
  4. project + positional encoding (1d by bag position / 2d by patch coords)
  5. transformer aggregation via special token -> slide feature
  6. residual slide context; linear head -> logits
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from paths_tpu.config import Config, PATHSProcessorConfig
from paths_tpu.models.aggregator import (
    aggregator_apply,
    aggregator_init,
    pos_encode_1d,
    pos_encode_2d,
)
from paths_tpu.models.batch import PatchBag
from paths_tpu.nn.core import linear_apply, linear_init, mlp_apply, mlp_init
from paths_tpu.nn.lstm import lstm_cell_apply


def processor_init(key, config: PATHSProcessorConfig, train_config: Config,
                   depth: int, dtype=jnp.float32) -> dict:
    kc, ki, kh, ka = jax.random.split(key, 4)
    num_logits = train_config.num_logits()
    d = config.patch_embed_dim

    if config.slide_ctx_mode == "concat":
        cls_in = config.trans_dim * (depth + 1)
    else:
        cls_in = config.trans_dim

    params = {
        "classification": linear_init(kc, cls_in, num_logits, dtype=dtype),
        "importance_mlp": mlp_init(
            ki, [d, config.importance_mlp_hidden_dim, 1], dtype=dtype),
        "agg": aggregator_init(ka, d, config.trans_dim, config.trans_heads,
                               config.trans_layers, dtype=dtype),
    }
    if not config.lstm:
        params["hctx_mlp"] = mlp_init(
            kh, [d, config.hierarchical_ctx_mlp_hidden_dim, d], dtype=dtype)
    return params


def processor_apply(params: dict, config: PATHSProcessorConfig,
                    train_config: Config, depth: int, bag: PatchBag, *,
                    lstm_params: Optional[dict] = None,
                    rng: Optional[jax.Array] = None,
                    deterministic: bool = True, seq_mesh=None) -> dict:
    """Process one level's bag -> logits / new contexts / importance.

    Returns {"logits": (B, C), "ctx_slide": (B, Ds), "ctx_patch": (B, N, Dp),
    "importance": (B, N)} matching `Processor.process`
    (`model/interface.py:61-80`).
    """
    cd = jnp.dtype(train_config.compute_dtype)
    fts = bag.fts
    b, n, d = fts.shape
    mask = bag.mask
    hdim = config.hierarchical_ctx_mlp_hidden_dim

    # ---- LSTM hierarchical context (`model/paths.py:74-91`)
    if config.lstm:
        assert lstm_params is not None
        if depth == 0:
            hs = jnp.zeros((b, n, d), fts.dtype)
            cs = jnp.zeros((b, n, hdim), fts.dtype)
        else:
            state = bag.ctx_patch[:, :, -1]
            assert state.shape[-1] == d + hdim
            hs, cs = state[..., :d], state[..., d:]
        hs, cs = lstm_cell_apply(lstm_params, fts, hs, cs, compute_dtype=cd)
        fts = fts + hs  # Y = X + h
        patch_ctx = jnp.concatenate([hs, cs], axis=-1)

    # ---- importance (`model/paths.py:95-98`); exactly 0 on padding
    imp = jax.nn.sigmoid(mlp_apply(params["importance_mlp"], fts,
                                   compute_dtype=cd))[..., 0]
    importance = jnp.where(mask, imp.astype(fts.dtype), 0.0)
    if config.importance_mode == "mul":
        fts = fts * importance[..., None]  # Z = Y * alpha

    # ---- RNN-style context when not using the LSTM (`model/paths.py:101-109`)
    if not config.lstm:
        if depth > 0 and config.hierarchical_ctx:
            hctx = mlp_apply(params["hctx_mlp"], bag.ctx_patch[:, :, -1],
                             compute_dtype=cd).astype(fts.dtype)
            hctx = jnp.where(mask[..., None], hctx, 0.0)
            fts = fts + hctx
        patch_ctx = fts

    # ---- positional encoding + projection (`model/paths.py:117-124`)
    patch_locs = bag.locs // config.patch_size
    if config.pos_encoding_mode == "1d":
        xs = pos_encode_1d(params["agg"], fts, compute_dtype=cd)
    elif config.pos_encoding_mode == "2d":
        xs = pos_encode_2d(params["agg"], fts, patch_locs, compute_dtype=cd)
    else:
        raise NotImplementedError(
            f"pos_encoding_mode={config.pos_encoding_mode!r}; the reference "
            "requires 1d or 2d (unencoded input skips the projection and "
            "would shape-error, `model/paths.py:118-124`)")

    # ---- aggregate (`model/paths.py:111-127`): empty conditional sequence
    cond = jnp.zeros((b, 0, config.trans_dim), xs.dtype)
    slide_features = aggregator_apply(
        params["agg"], cond, xs, None, mask,
        dropout_rate=config.dropout, rng=rng, deterministic=deterministic,
        compute_dtype=cd, impl=train_config.attention_impl,
        seq_mesh=seq_mesh)

    # ---- residual slide context (`model/paths.py:130-131`)
    if config.slide_ctx_mode == "residual" and bag.ctx_depth > 0:
        slide_features = slide_features + bag.ctx_slide[:, -1]

    # ---- logits (`model/paths.py:134-139`)
    if config.slide_ctx_mode == "concat":
        all_ctx = bag.ctx_slide.reshape(b, -1)
        ft = jnp.concatenate([all_ctx, slide_features], axis=1)
        logits = linear_apply(params["classification"], ft, compute_dtype=cd)
    else:
        logits = linear_apply(params["classification"], slide_features,
                              compute_dtype=cd)

    return {
        "logits": logits.astype(jnp.float32),
        "ctx_slide": slide_features,
        "ctx_patch": patch_ctx,
        "importance": importance,
    }

"""Trajectory-level training parity vs the torch oracle.

Both implementations start from a converted common init and train with
AdamW + per-epoch exponential LR decay on identical synthetic slides for
several epochs; per-epoch training losses and the final train c-index
must agree. This is the strongest available substitute for reproducing
the reference's recorded `train_stats.pkl` numbers (BASELINE.md: train
loss 0.0538 / c-index 0.9712 are not reproducible without TCGA data) —
it validates the full loop: forward, top-K recursion, NLL loss,
backward, and optimizer semantics (`train.py:49-68`, `utils.py:283-305`).
"""
import jax
import numpy as np
import torch

from helpers_refloop import ref_end2end
from helpers_torch import TorchRecursive, to_numpy_sd
from paths_tpu.convert import recursive_from_torch
from paths_tpu.train.loop import make_optimizer, make_step_fns, set_lr
from paths_tpu.train.metrics import concordance_index_censored
from test_hierarchy import jax_inputs, make_grids
from test_model_parity import small_config, torch_kwargs

EPOCHS = 4
LR, WD, DECAY = 1e-3, 1e-2, 0.9
N_SLIDES, BATCH = 6, 3


def torch_nll(hazards, y, c, alpha=0.4, eps=1e-7):
    """The reference's discrete survival NLL (`utils.py:283-305`),
    numerically identical to ops.losses.nll_survival_loss."""
    b = hazards.shape[0]
    surv = torch.cumprod(1.0 - hazards, dim=1)
    surv_pad = torch.cat([torch.ones(b, 1), surv], dim=1)
    r = torch.arange(b)
    s_prev = surv_pad[r, y].clamp(min=eps)
    h_this = hazards[r, y].clamp(min=eps)
    s_this = surv_pad[r, y + 1].clamp(min=eps)
    unc = -(1 - c) * (s_prev.log() + h_this.log())
    cen = -c * s_this.log()
    return ((1 - alpha) * (cen + unc) + alpha * unc).mean()


def make_dataset(cfg, seed=0):
    """Identically-shaped synthetic slides + survival labels."""
    rng = np.random.default_rng(seed)
    dims = [(2, 3), (4, 6), (8, 12)]
    # bg_fraction=0: identical all-zero background patches tie in
    # importance, and torch.topk vs masked_topk break ties differently —
    # legal per the reference contract but fatal for trajectory comparison
    slides = [make_grids(rng, dims, cfg.model_config.patch_embed_dim,
                         bg_fraction=0.0) for _ in range(N_SLIDES)]
    y = rng.integers(0, cfg.nbins, N_SLIDES)
    c = rng.integers(0, 2, N_SLIDES)
    c[:2] = 0  # ensure comparable (uncensored) pairs for the c-index
    times = rng.uniform(10, 100, N_SLIDES)
    return slides, y, c, times


def test_training_trajectory_matches_torch():
    cfg = small_config(dropout=0.0)  # the oracle trains without dropout
    cfg.lr, cfg.weight_decay, cfg.lr_decay_per_epoch = LR, WD, DECAY
    mc = cfg.model_config
    ds_dim, dp_dim = mc.ctx_dim()

    torch.manual_seed(3)
    tmodel = TorchRecursive(cfg.num_levels, lstm=mc.lstm, **torch_kwargs(cfg))
    params = recursive_from_torch(to_numpy_sd(tmodel), cfg)

    slides, y, c, times = make_dataset(cfg)
    batches = [list(range(s, s + BATCH))
               for s in range(0, N_SLIDES, BATCH)]
    jax_batches = [jax_inputs([slides[i] for i in idx], cfg)
                   for idx in batches]

    topt = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=WD)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    update, _ = make_step_fns(cfg, tx)

    losses_t, losses_j = [], []
    risks_t = risks_j = None
    for e in range(EPOCHS):
        lr_e = LR * DECAY**e
        for g in topt.param_groups:
            g["lr"] = lr_e
        opt_state = set_lr(opt_state, lr_e)

        el_t, el_j, er_t, er_j = [], [], [], []
        for idx, (bag0, tables) in zip(batches, jax_batches):
            yb = np.asarray(y[idx]), np.asarray(c[idx])
            # torch step (reference per-slide recursion loop)
            logits, _ = ref_end2end(
                tmodel, [slides[i] for i in idx], cfg.num_levels,
                cfg.top_k_patches, mc.patch_size, ds_dim, dp_dim)
            hazards = torch.sigmoid(logits)
            loss_t = torch_nll(hazards, torch.tensor(yb[0]),
                               torch.tensor(yb[1], dtype=torch.float32))
            topt.zero_grad()
            loss_t.backward()
            topt.step()
            el_t.append(float(loss_t.detach()))
            er_t.append(-torch.cumprod(1 - hazards.detach(), 1).sum(1).numpy())

            # jax step (fused engine, one jitted program)
            labels = {"survival_bin": jax.numpy.asarray(yb[0]),
                      "censored": jax.numpy.asarray(yb[1])}
            params, opt_state, loss_j, aux = update(
                params, opt_state, bag0, tables, labels,
                jax.random.PRNGKey(0))
            el_j.append(float(loss_j))
            haz = np.asarray(aux["pred"])
            er_j.append(-np.cumprod(1 - haz, 1).sum(1))

        losses_t.append(np.mean(el_t))
        losses_j.append(np.mean(el_j))
        risks_t, risks_j = np.concatenate(er_t), np.concatenate(er_j)

    # Tolerance note: gradients match to ~1e-7 (test_gradient_parity and
    # the grad-tree comparison that produced these bounds), but AdamW's
    # first-step update is ±lr·sign(g) — params with near-zero gradients
    # get opposite-sign updates from sub-1e-7 float noise, so trajectories
    # drift at the percent level by construction. Optimizer *semantics*
    # are pinned exactly by test_adamw_matches_torch below; here we pin
    # the end-to-end shape of training.
    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-2)
    assert losses_j[-1] < losses_j[0], "training did not reduce the loss"
    assert losses_t[-1] < losses_t[0], "oracle did not reduce the loss"

    events = (1 - c).astype(bool)
    ci_t = concordance_index_censored(events, times, risks_t)[0]
    ci_j = concordance_index_censored(events, times, risks_j)[0]
    # c-index granularity at N_SLIDES=6 is ~1/11 per comparable pair;
    # allow a single ranking swap from percent-level trajectory drift
    assert abs(ci_t - ci_j) <= 0.1, (ci_t, ci_j)
    # and the risk rankings themselves must agree pairwise almost fully
    dt = np.sign(risks_t[:, None] - risks_t[None, :])
    dj = np.sign(risks_j[:, None] - risks_j[None, :])
    agree = (dt == dj)[np.triu_indices(len(risks_t), 1)].mean()
    assert agree >= 0.85, agree


def test_adamw_matches_torch():
    """AdamW + per-epoch exponential LR decay, fed IDENTICAL gradients:
    parameter trajectories must match tightly over several steps. This
    isolates optimizer semantics (decoupled weight decay, bias
    correction, eps placement, LR injection) from model float noise."""
    shapes = [(4, 6), (6,), (3, 3)]
    rng = np.random.default_rng(0)
    init = [rng.normal(size=s).astype(np.float32) for s in shapes]
    grads_per_step = [[rng.normal(size=s).astype(np.float32) * 10.0**-k
                       for k, s in enumerate(shapes)] for _ in range(6)]

    tparams = [torch.nn.Parameter(torch.tensor(p)) for p in init]
    topt = torch.optim.AdamW(tparams, lr=LR, weight_decay=WD)

    import optax

    from paths_tpu.config import Config, PATHSProcessorConfig
    cfg = Config(model_config=PATHSProcessorConfig(), lr=LR,
                 weight_decay=WD)
    tx = make_optimizer(cfg)
    jparams = [jax.numpy.asarray(p) for p in init]
    state = tx.init(jparams)

    for step, gs in enumerate(grads_per_step):
        lr_e = LR * DECAY ** (step // 2)   # decay every 2 steps
        for g in topt.param_groups:
            g["lr"] = lr_e
        state = set_lr(state, lr_e)

        topt.zero_grad()
        for p, g in zip(tparams, gs):
            p.grad = torch.tensor(g)
        topt.step()

        updates, state = tx.update([jax.numpy.asarray(g) for g in gs],
                                   state, jparams)
        jparams = optax.apply_updates(jparams, updates)

    for tp, jp in zip(tparams, jparams):
        np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                                   atol=1e-6)

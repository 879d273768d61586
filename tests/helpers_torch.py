"""Torch reference models for parity testing.

These are compact PyTorch re-statements of the reference PATHS math
(model/paths.py, model/interface.py, model/aggregator.py), built on
`torch.nn.Transformer` exactly like the reference. Attribute names follow
the reference's state_dict key contract so `paths_tpu.convert` can be
exercised on their state dicts. Test-only code — the framework itself never
imports torch.
"""
import math

import numpy as np
import torch
from torch import nn


def np_pe_1d(length, dim, k=10000.0):
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-math.log(k) / dim))
    pe = np.zeros((length, dim))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return torch.tensor(pe, dtype=torch.float32)


def np_pe_2d(xpos, ypos, dim, k=10000.0):
    n = xpos.shape[0]
    div = np.exp(np.arange(0, dim // 2, 2) * (-math.log(k) / dim))[None]
    pe = np.zeros((n, dim))
    pe[:, 0:dim // 2:2] = np.sin(xpos[:, None] * div)
    pe[:, 1:dim // 2:2] = np.cos(xpos[:, None] * div)
    pe[:, dim // 2::2] = np.sin(ypos[:, None] * div)
    pe[:, dim // 2 + 1::2] = np.cos(ypos[:, None] * div)
    return torch.tensor(pe, dtype=torch.float32)


class TorchLSTMCell(nn.Module):
    def __init__(self, xdim, hdim, cdim):
        super().__init__()
        self.forget_gate = nn.Sequential(nn.Linear(xdim + hdim, cdim), nn.Sigmoid())
        self.remember_gate = nn.Sequential(nn.Linear(xdim + hdim, cdim), nn.Sigmoid())
        self.remember_map = nn.Sequential(nn.Linear(xdim + hdim, cdim), nn.Tanh())
        self.out_select_gate = nn.Sequential(nn.Linear(hdim + xdim, hdim), nn.Sigmoid())
        self.mem_to_out = nn.Sequential(nn.Linear(cdim, hdim), nn.Tanh())

    def forward(self, xs, hs, cs):
        xhs = torch.cat((xs, hs), dim=-1)
        cs = cs * self.forget_gate(xhs)
        cs = cs + self.remember_gate(xhs) * self.remember_map(xhs)
        hs = self.out_select_gate(xhs) * self.mem_to_out(cs)
        return hs, cs


class TorchAggregator(nn.Module):
    def __init__(self, input_dim, model_dim, nhead, layers, dropout=0.0):
        super().__init__()
        self.dim = model_dim
        self.proj_in = nn.Linear(input_dim, model_dim)
        self.transformer = nn.Transformer(
            model_dim, nhead=nhead, num_encoder_layers=layers,
            num_decoder_layers=layers, dim_feedforward=model_dim * 4,
            dropout=dropout, batch_first=True)
        self.special_token = nn.Parameter(torch.randn(model_dim))

    def encode(self, fts, locs, mode):
        xs = self.proj_in(fts)
        b, n, d = xs.shape
        if mode == "1d":
            return xs + np_pe_1d(n, d)[None]
        pe = np_pe_2d(locs[..., 0].reshape(-1).numpy().astype(float),
                      locs[..., 1].reshape(-1).numpy().astype(float), d)
        return xs + pe.view(b, n, d)

    def forward(self, seq1, seq2, lengths1, lengths2):
        b = seq2.shape[0]
        tok = self.special_token.view(1, 1, -1).repeat(b, 1, 1)
        seq2 = torch.cat((tok, seq2), dim=1)
        lengths2 = lengths2 + 1
        mask1 = (torch.arange(seq1.shape[1])[None] >= lengths1[:, None]) if lengths1 is not None else None
        mask2 = torch.arange(seq2.shape[1])[None] >= lengths2[:, None]
        out = self.transformer(src=seq1, tgt=seq2, src_key_padding_mask=mask1,
                               memory_key_padding_mask=mask1,
                               tgt_key_padding_mask=mask2)
        return out[:, 0]


class TorchProcessor(nn.Module):
    """One level of the reference model (lstm / residual / mul / 2d-PE path,
    plus the non-lstm RNN branch)."""

    def __init__(self, d, trans_dim, heads, layers, imp_hidden, hdim,
                 num_logits, depth, lstm=True, slide_ctx_mode="residual",
                 pos_mode="2d", importance_mode="mul", patch_size=256):
        super().__init__()
        self.depth, self.d, self.hdim = depth, d, hdim
        self.lstm_mode, self.slide_ctx_mode = lstm, slide_ctx_mode
        self.pos_mode, self.importance_mode = pos_mode, importance_mode
        self.patch_size = patch_size
        cls_in = trans_dim * (depth + 1) if slide_ctx_mode == "concat" else trans_dim
        self.classification_layer = nn.Linear(cls_in, num_logits)
        self.importance_mlp = nn.Sequential(
            nn.Linear(d, imp_hidden), nn.ReLU(), nn.Linear(imp_hidden, 1))
        if not lstm:
            self.hctx_mlp = nn.Sequential(
                nn.Linear(d, hdim), nn.ReLU(), nn.Linear(hdim, d))
        self.global_agg = TorchAggregator(d, trans_dim, heads, layers)

    def forward(self, fts, locs, num_ims, ctx_slide, ctx_patch, lstm=None):
        b, n, d = fts.shape
        valid = torch.arange(n)[None] < num_ims[:, None]
        x = fts
        if self.lstm_mode:
            if self.depth == 0:
                hs = torch.zeros(b, n, self.d)
                cs = torch.zeros(b, n, self.hdim)
            else:
                state = ctx_patch[:, :, -1]
                hs, cs = state[..., :self.d], state[..., self.d:]
            hs, cs = lstm(x, hs, cs)
            x = x + hs
            patch_ctx = torch.cat((hs, cs), dim=-1)

        imp = torch.zeros(b, n, 1)
        imp[valid] = torch.sigmoid(self.importance_mlp(x[valid]))
        imp = imp[..., 0]
        if self.importance_mode == "mul":
            x = x * imp[..., None]

        if not self.lstm_mode:
            if self.depth > 0:
                hctx = torch.zeros(b, n, self.d)
                hctx[valid] = self.hctx_mlp(ctx_patch[:, :, -1][valid])
                x = x + hctx
            patch_ctx = x

        patch_locs = locs // self.patch_size
        xs = self.global_agg.encode(x, patch_locs, self.pos_mode)
        cond = torch.zeros(b, 0, self.global_agg.dim)
        slide_features = self.global_agg(cond, xs, None, num_ims)
        if self.slide_ctx_mode == "residual" and ctx_slide.shape[1] > 0:
            slide_features = slide_features + ctx_slide[:, -1]
        if self.slide_ctx_mode == "concat":
            ft = torch.cat((ctx_slide.flatten(1), slide_features), dim=1)
            logits = self.classification_layer(ft)
        else:
            logits = self.classification_layer(slide_features)
        return {"logits": logits, "ctx_slide": slide_features,
                "ctx_patch": patch_ctx, "importance": imp}


class TorchRecursive(nn.Module):
    def __init__(self, num_levels, lstm=True, **kw):
        super().__init__()
        self.procs = nn.ModuleList(
            [TorchProcessor(depth=i, lstm=lstm, **kw) for i in range(num_levels)])
        if lstm:
            self.lstm = TorchLSTMCell(kw["d"], kw["d"], kw["hdim"])
        self.use_lstm = lstm

    def forward(self, depth, *args):
        return self.procs[depth](*args, lstm=self.lstm if self.use_lstm else None)


def to_numpy_sd(module: nn.Module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}

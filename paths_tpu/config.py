"""Experiment configuration.

JSON-file-per-experiment-directory config system with the same schema and
normalization rules as the reference (`config.py:19-131`,
`models/sample/config.json`): a `config.json` inside a model directory is
parsed into dataclasses; scalar `top_k_patches` / `batch_size` entries are
broadcast to per-level lists; `lstm=True` requires `hierarchical_ctx=True`.

TPU-specific additions (all optional, with defaults that keep old configs
valid): `compute_dtype`, `level0_bucket`, `mesh_shape`.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class PATHSProcessorConfig:
    """Per-magnification-level model hyperparameters.

    Mirrors reference `config.py:19-37` field for field.
    """

    hierarchical_ctx: bool = True
    slide_ctx_mode: str = "residual"  # residual / concat / none

    patch_embed_dim: int = 1024
    dropout: float = 0.0
    patch_size: int = 256  # only needed for visualisation / preprocessing

    importance_mode: str = "mul"  # mul / none

    trans_dim: int = 192
    trans_heads: int = 4
    trans_layers: int = 2
    pos_encoding_mode: str = "1d"  # 1d / 2d / none

    importance_mlp_hidden_dim: int = 128
    hierarchical_ctx_mlp_hidden_dim: int = 256
    lstm: bool = True

    def ctx_dim(self) -> Tuple[int, int]:
        """(slide ctx dim, patch ctx dim); reference `model/paths.py:148-151`."""
        if self.lstm:
            return self.trans_dim, self.patch_embed_dim + self.hierarchical_ctx_mlp_hidden_dim
        return self.trans_dim, self.patch_embed_dim


@dataclass
class Config:
    """Task / recursion / training / data configuration.

    Mirrors reference `config.py:41-79`. Paths may be absent for test-mode
    loading (reference passes `test_mode=True` for visualisation).
    """

    model_config: PATHSProcessorConfig

    # Recursion
    base_power: float = 0.625
    magnification_factor: int = 2
    num_levels: int = 5
    num_epochs: int = 40
    top_k_patches: List[int] = field(default_factory=lambda: [20, 20, 20, 20])

    model_type: str = "PATHS"

    # Data
    wsi_dir: str = ""
    csv_path: str = ""
    nbins: int = 4
    loss: str = "nll"

    task: str = "survival"  # survival / subtype_classification
    filter_to_subtypes: Optional[List[str]] = None

    preprocess_dir: Optional[str] = None

    # Training
    batch_size: List[int] = field(default_factory=lambda: [32])
    save_epochs: int = 10
    eval_epochs: int = 1
    lr: float = 2e-5
    lr_decay_per_epoch: float = 0.99
    seed: int = 0
    early_stopping: bool = False
    weight_decay: float = 1e-2
    min_epochs: int = 0

    root_name: str = ""

    # optional global gradient-norm clip (reference has none; useful at
    # production scale). None disables.
    clip_grad_norm: Optional[float] = None

    hipt_splits: bool = False
    hipt_val_proportion: float = 0.0
    # directory holding the HIPT split CSVs (default: ./data/splits, the
    # reference's relative layout; populate via tools/import_reference_splits.py)
    splits_dir: Optional[str] = None

    # --- TPU-native additions (absent from reference) ---
    # dtype used for matmuls/attention ("float32" or "bfloat16"); params are fp32
    compute_dtype: str = "float32"
    # "xla" (default): XLA's fused attention. "pallas": the masked
    # flash-attention kernel (O(block) VMEM — K/V stream through one
    # block per grid step; 23x over XLA at 8k keys in bf16, and the only
    # option at 16k+ where XLA's score matrix exceeds HBM). "auto":
    # pallas for any bag of >= 4096 keys on TPU.
    attention_impl: str = "xla"
    # dtype for feature tables / bags in HBM ("float32" or "bfloat16";
    # bf16 halves HBM residency and host->device traffic)
    table_dtype: str = "float32"
    # "fused": whole-batch tables resident in HBM (fastest); "streaming":
    # host-gathered two-pass execution for datasets whose tables exceed
    # HBM (see paths_tpu/engine/streaming.py); "auto": pick per run from
    # an HBM estimate of the collated tables (engine/auto.py — logs the
    # decision, errs toward streaming near the boundary)
    engine: str = "fused"
    # level-0 bags are padded up to a multiple of this (static-shape bucketing)
    level0_bucket: int = 256
    # keep the val/test eval batches device-resident across eval epochs
    # (they are identical every pass: no shuffle, global pads). Skips
    # their re-collation + host->device transfer per eval — significant
    # on transfer-bound links — at the cost of holding both eval splits'
    # tables in HBM. Fused engine only.
    cache_eval_batches: bool = False
    # pad every batch to dataset-global shape maxima -> exactly ONE
    # compiled shape per program per run (vs dozens of multi-minute
    # compiles from per-batch maxima under shuffle); False falls back to
    # per-batch bucketing
    static_shapes: bool = True
    # mesh shape: [dp] = 1-D data-parallel; [dp, sp] with sp > 1 adds a
    # `model` axis sharding each slide's level-0 patch dimension
    # (sequence parallelism). None = 1-D over all available devices.
    mesh_shape: Optional[List[int]] = None
    # schedule for sequence-parallel attention when mesh_shape = [dp, sp]
    # and the pallas path is engaged: "gathered" (all-gather K/V, O(N)
    # per-chip memory) or "ring" (rotate K/V blocks, O(N/sp) memory)
    seq_attention: str = "gathered"
    # rematerialize each level's forward in the backward pass
    # (jax.checkpoint): activation HBM drops from O(sum of level widths)
    # to O(widest level) at ~1/3 extra FLOPs — the standard trade for
    # training with oversize level-0 bags on one chip
    remat: bool = False
    # PRNG for training randomness (dropout masks). "auto" = "rbg" on
    # TPU, "threefry2x32" elsewhere: threefry dropout sampling costs
    # ~5 ms of a 19 ms flagship train step on v5e (27% — measured,
    # docs/ARCHITECTURE.md); rbg is the TPU-native counter RNG. Both
    # draw iid Bernoulli masks; streams are deterministic per seed.
    prng_impl: str = "auto"
    # "npz" (default, flat-array files) or "orbax" (Orbax
    # StandardCheckpointer tree: sharded-array aware, multi-host safe)
    checkpoint_backend: str = "npz"

    def __post_init__(self):
        if isinstance(self.top_k_patches, int):
            self.top_k_patches = [self.top_k_patches] * (self.num_levels - 1)
        if isinstance(self.batch_size, int):
            self.batch_size = [self.batch_size] * self.num_levels
        if isinstance(self.num_epochs, list):
            self.num_epochs = self.num_epochs[0]
        if isinstance(self.model_config, dict):
            self.model_config = PATHSProcessorConfig(**self.model_config)
        if self.model_config.lstm:
            assert self.model_config.hierarchical_ctx, (
                "If LSTM mode is enabled, hierarchical context must be enabled."
            )
        if self.magnification_factor != 2:
            # the preprocessed-path recursion expands each patch into its
            # four x2 quadrant children; the reference has the same
            # constraint hard-coded (slide.py:305-315, utils.py:261)
            print(f"WARNING: magnification_factor={self.magnification_factor}"
                  " is only honored by the raw-slide path; the preprocessed "
                  "hierarchy is fixed at x2 (as in the reference)")

    # ------------------------------------------------------------------ I/O

    @staticmethod
    def load(root_path: str, test_mode: bool = False) -> "Config":
        """Load `<root_path>/config.json` (reference `config.py:81-115`)."""
        jsonpath = os.path.join(root_path, "config.json")
        assert os.path.isdir(root_path), f"Model directory '{root_path}' not found!"
        assert os.path.isfile(jsonpath), f"config.json not found in '{root_path}'."

        with open(jsonpath, "r") as f:
            data = json.load(f)

        if data.get("model_type", "PATHS") != "PATHS":
            raise NotImplementedError(f"Unknown model type '{data['model_type']}'")

        known = {f.name for f in dataclasses.fields(Config)}
        unknown = set(data) - known
        if unknown:
            raise ValueError(f"Unknown config keys: {sorted(unknown)}")

        config = Config(**data)

        if not test_mode and config.preprocess_dir is not None:
            assert os.path.isdir(config.preprocess_dir), (
                f"Preprocessing root directory '{config.preprocess_dir}' not found!"
            )
        return config

    def save(self, root_path: str) -> None:
        os.makedirs(root_path, exist_ok=True)
        with open(os.path.join(root_path, "config.json"), "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        return d

    # ------------------------------------------------------------- helpers

    def power_levels(self) -> List[float]:
        """Magnification of each level (reference `config.py:117-118`)."""
        return [self.base_power * self.magnification_factor**i for i in range(self.num_levels)]

    def num_logits(self) -> int:
        if self.task == "survival":
            return self.nbins
        assert self.filter_to_subtypes, "subtype task requires filter_to_subtypes"
        return len(self.filter_to_subtypes)

    def lr_schedule(self):
        """Per-epoch exponential decay (reference `config.py:130-131`).

        Returns a function epoch -> lr. The optimizer applies it per epoch,
        matching torch's ExponentialLR stepped once per epoch.
        """
        def schedule(epoch: int) -> float:
            return self.lr * self.lr_decay_per_epoch**epoch

        return schedule


def power_str(power: float) -> str:
    """Canonical 3-decimal magnification suffix used in preprocessed file
    names (`{slide_id}_{power:.3f}`, reference `preprocess/loader.py:14-18`)."""
    return f"{power:.3f}"

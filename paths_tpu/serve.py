"""Serving session: slide-id in, prediction out.

The reference has no serving layer at all — inference only exists inside
the training script's eval loop (`/root/reference/train.py:106-116`).
This module is the deployment-side counterpart of `paths_tpu.export`: it
owns a feature store, assembles statically-shaped batches for requested
slide ids, and runs them through either a frozen StableHLO artifact
(exact export-time shapes, zero model code in the hot path) or a live
jitted model. `paths_tpu.cli.serve` wraps it in an HTTP endpoint.

Shape discipline: artifact sessions collate with the EXACT pads the
artifact was exported with (`export.artifact_pads`), so every request
hits the precompiled program; live sessions use the trainer's bucketed
collation plus power-of-two BATCH buckets — a short request moves only
~its own feature bytes host->device (the dominant serving cost: the
inputs ARE the features) while distinct compiled shapes stay bounded
at log2(B)+1.
"""
from __future__ import annotations

import os
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from paths_tpu.config import Config, power_str
from paths_tpu.data.dataset import SlideDataset, collate_batch
from paths_tpu.data.feature_store import FeatureStore


def prediction_rows(config: Config, slide_ids: Sequence[str],
                    pred: np.ndarray) -> List[dict]:
    """Per-slide prediction dicts from raw model outputs — the ONE place
    the post-processing lives (cli.predict formats the same rows to
    CSV). Survival: `risk` (reference `eval.py:59-64`) + per-bin
    `hazards`. Subtype: argmax `pred` + per-class `probs`."""
    from paths_tpu.train.metrics import class_probs, survival_risk

    rows = []
    for sid, p in zip(slide_ids, np.asarray(pred)):
        if config.task == "survival":
            rows.append({"slide_id": sid,
                         "risk": float(survival_risk(p)),
                         "hazards": [float(h) for h in p]})
        else:
            probs = class_probs(p)
            classes = config.filter_to_subtypes
            rows.append({"slide_id": sid,
                         "pred": classes[int(np.argmax(probs))],
                         "probs": {c: float(q)
                                   for c, q in zip(classes, probs)}})
    return rows


def store_slide_ids(store: FeatureStore, base_power: float) -> List[str]:
    """Slide ids with a base-power grid present in the store (the same
    presence rule the dataset loader uses to keep a row,
    reference `data_utils/dataset.py:29-39`)."""
    suffix_len = len(f"_{power_str(base_power)}")
    ids = set()
    for fn in os.listdir(store.root):
        stem, ext = os.path.splitext(fn)
        if ext in (".npy", ".pt") and stem.endswith(
                f"_{power_str(base_power)}"):
            ids.add(stem[:-suffix_len])
    return sorted(ids)


def serving_dataset(config: Config, store: FeatureStore,
                    slide_ids: Sequence[str],
                    cache_slides: bool = True) -> SlideDataset:
    """A label-free `SlideDataset` over arbitrary slide ids: serving has
    no survival/subtype labels, so dummy columns satisfy the dataset
    contract (they are never read on the prediction path)."""
    frame = pd.DataFrame({
        "slide_id": [f"{sid}.svs" for sid in slide_ids],
        "survival_months": 0.5,
        "censorship": 1,
    })
    if config.task == "subtype_classification":
        frame["oncotree_code"] = config.filter_to_subtypes[0]
    return SlideDataset(frame, [0.0, 1.0], config, store, preload=False,
                        cache_slides=cache_slides)


class ServingSession:
    """Batched slide-level prediction over a feature store.

    :param model_dir: trained model directory (config + checkpoint)
    :param store_root: feature-store root; defaults to the config's
        `preprocess_dir`
    :param artifact: path to a `cli.export` StableHLO artifact. Frozen
        artifacts run self-contained; weights-as-arguments artifacts
        take params from the model_dir checkpoint. Without an artifact,
        the live jitted model serves.
    :param batch_size: serving batch width (live sessions only; an
        artifact fixes its own batch unless exported `--poly-batch`)
    :param cache_slides: keep materialized slide tables in RAM across
        requests (trade memory for repeat-request latency)
    :param cache_batches: keep up to this many collated batches resident
        on DEVICE, keyed by their slide indices. A repeat request then
        skips collation and the feature H2D entirely — the dominant
        serving cost (~60 MB/slide at flagship scale) — and pays only
        the forward (~6 ms). 0 disables.
    :param mesh: a `jax.sharding.Mesh` with a `data` axis to serve
        data-parallel across chips (live fused sessions only): params
        replicate, each request's batch shards along `data`, and every
        chip's feature slice crosses its own host->device link. Batch
        widths then bucket to multiples of the data axis.
    """

    def __init__(self, model_dir: str, store_root: Optional[str] = None,
                 artifact: Optional[str] = None,
                 batch_size: Optional[int] = None,
                 cache_slides: bool = True, cache_batches: int = 4,
                 mesh=None):
        import jax

        self.config = Config.load(model_dir, test_mode=True)
        self.model_dir = model_dir
        self.store = FeatureStore(store_root or self.config.preprocess_dir)
        self.slide_ids = store_slide_ids(self.store, self.config.base_power)
        self._dataset = serving_dataset(self.config, self.store,
                                        self.slide_ids,
                                        cache_slides=cache_slides)
        self._index: Dict[str, int] = {sid: i
                                       for i, sid in enumerate(self.slide_ids)}
        if self.config.engine == "auto":
            # resolve from the store's actual shape bounds before any
            # engine-dependent branch below; self.config is session-owned
            # (Config.load copy), so recording the decision on it is safe
            from paths_tpu.engine.auto import resolve_engine

            auto_pads = (self._dataset.global_pads()
                         if self.slide_ids else None)
            self.config.engine = resolve_engine(
                self.config, auto_pads,
                batch_size or self.config.batch_size[0])
        self._lock = threading.Lock()   # one batch on device at a time
        from collections import OrderedDict

        self._batch_cache: "OrderedDict" = OrderedDict()
        self._cache_batches = cache_batches
        self._mesh = None               # set below for live mesh sessions
        self._put = None                # sharded device placement (mesh)
        if mesh is not None:
            # real raises, not asserts: -O must not silently drop a mesh
            if artifact is not None or self.config.engine == "streaming":
                raise ValueError(
                    "mesh serving is implemented for live fused sessions")
            from paths_tpu.parallel.mesh import data_axis_size as _das

            eff_bs = batch_size or self.config.batch_size[0]
            if eff_bs % _das(mesh) != 0:
                raise ValueError(
                    f"batch_size {eff_bs} must be a multiple of the data "
                    f"axis ({_das(mesh)}) so every bucket shards evenly")

        self._params = None
        if artifact:
            from paths_tpu.export import artifact_signature, load_serving

            with open(artifact, "rb") as f:
                self._exp = load_serving(f.read())
            self._frozen, self.batch_size, self._pads = artifact_signature(
                self._exp)
            self._poly_artifact = self.batch_size is None
            if self._poly_artifact:
                # poly-batch: symbolic axis — the operator picks the max
                # serving width at load time; requests pad to power-of-two
                # buckets (each DISTINCT concrete shape through exp.call
                # costs one XLA compile, so buckets bound that at log2(B))
                self.batch_size = batch_size or self.config.batch_size[0]
            if not self._frozen:
                self._params = self._load_params()
            self._call = self._exp.call
        elif self.config.engine == "streaming":
            # streaming-trained models hold tables too big for HBM; serve
            # through the same host-streaming forward they trained with
            # (tables stay memory-mapped on the host, level-0 bag only on
            # device) instead of a fused program that would OOM on
            # exactly those slides
            from paths_tpu.engine.streaming import StreamingEngine

            self._exp = None
            self._frozen = False
            self._poly_artifact = False
            self._pads = (self._dataset.global_pads(level0_only=True)
                          if self.config.static_shapes and self.slide_ids
                          else None)
            self.batch_size = batch_size or self.config.batch_size[0]
            self._params = self._load_params()
            self._eng = StreamingEngine(self.config)
            self._call = None
        else:
            from paths_tpu.export import make_serving_fn

            self._exp = None
            self._frozen = False
            self._poly_artifact = False
            # under static_shapes (the trainer's default contract), scan
            # store-wide pads once at startup so EVERY request collates
            # to one compiled shape — a fresh shape costs a multi-minute
            # jit on remote-compile tunnels, unacceptable mid-request
            self._pads = (self._dataset.global_pads()
                          if self.config.static_shapes and self.slide_ids
                          else None)
            self.batch_size = batch_size or self.config.batch_size[0]
            self._params = self._load_params()
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                from paths_tpu.parallel.mesh import replicate

                self._mesh = mesh
                self._params = replicate(mesh, self._params)
                sharding = NamedSharding(mesh, PartitionSpec("data"))
                # host->SHARDED-device placement used at collation: each
                # chip's feature slice crosses its own link (vs landing
                # whole on one device and resharding over ICI)
                self._put = lambda a: jax.device_put(np.asarray(a),
                                                     sharding)
            self._call = jax.jit(make_serving_fn(self.config))

    def _load_params(self):
        import jax

        from paths_tpu.models.recursive import recursive_init
        from paths_tpu.train.state import load_state

        params = recursive_init(jax.random.PRNGKey(self.config.seed),
                                self.config)
        params, _, _ = load_state(self.model_dir, params, config=self.config)
        return params

    def _check_artifact_shapes(self, indices, bag, tables) -> None:
        """Slides preprocessed AFTER export can exceed the artifact's
        frozen input shapes; reject them with a clear message instead of
        surfacing an opaque XLA aval-mismatch from exp.call."""
        got_n0 = int(bag.mask.shape[1])
        got_rows = [0] + [int(t.fts.shape[1]) for t in tables]
        got_grid = [(0, 0)] + [tuple(map(int, t.index.shape[1:3]))
                               for t in tables]
        if (got_n0 <= self._pads["n0"]
                and all(g <= p for g, p in zip(got_rows,
                                               self._pads["rows"]))
                and all(gh <= ph and gw <= pw
                        for (gh, gw), (ph, pw) in zip(
                            got_grid, self._pads["grid_hw"]))):
            return
        names = sorted({self.slide_ids[i] for i in indices})
        raise ValueError(
            f"slides exceed the artifact's export-time shapes "
            f"(level-0 width {got_n0} > {self._pads['n0']} or table rows "
            f"{got_rows} > {self._pads['rows']}); offending batch: "
            f"{names}. Re-export the artifact with current global pads.")

    def _pad_width(self, n: int) -> int:
        """Batch width for an n-slide chunk. A FIXED artifact has one
        program: always its batch. Live / poly-batch sessions pad to the
        next power of two instead — a short request then moves only
        ~its own feature bytes host->device (the dominant serving cost:
        the inputs ARE the features, ~60 MB/slide at flagship scale)
        while the distinct-shape count stays bounded at log2(B)+1."""
        if self._exp is not None and not self._poly_artifact:
            return self.batch_size
        from paths_tpu.parallel.mesh import data_axis_size

        width = data_axis_size(self._mesh)   # 1 without a mesh
        while width < min(n, self.batch_size):
            width *= 2
        return min(width, self.batch_size)

    def _run(self, indices: Sequence[int]) -> np.ndarray:
        """One device batch (padded by repeating the last slide; extra
        rows trimmed). Returns pred rows for `indices` only."""
        from paths_tpu.export import bag_to_dict, tables_to_dicts

        import jax

        n = len(indices)
        padded = (list(indices)
                  + [indices[-1]] * (self._pad_width(n) - n))

        if self._exp is None and self._call is None:   # streaming engine
            from paths_tpu.data.dataset import collate_bag0

            bag0 = self._cached(padded, lambda: collate_bag0(
                self._dataset, padded,
                level0_bucket=self.config.level0_bucket, pads=self._pads))
            host_tables = [self._dataset.slides[i].tables for i in padded]
            outs, _ = self._eng.forward(self._params, bag0, host_tables,
                                        deterministic=True)
            logits = outs[-1]["logits"]
            pred = (jax.nn.sigmoid(logits)
                    if self.config.task == "survival" else logits)
            return np.asarray(pred)[:n]

        if self._exp is not None:        # exact export-time shapes
            def assemble():
                bag, tables, _ = collate_batch(
                    self._dataset, padded, level0_bucket=1, row_bucket=1,
                    grid_bucket=1, pads=self._pads)
                self._check_artifact_shapes(padded, bag, tables)
                return bag_to_dict(bag), tables_to_dicts(tables)

            bag_d, tab_d = self._cached(padded, assemble)
            args = (bag_d, tab_d)
            if not self._frozen:
                args = (self._params,) + args
            out = self._call(*args)
        else:                            # trainer-style bucketed collation
            def assemble():
                # with a mesh, `put` places each array sharded straight
                # from the host — every chip's slice crosses its own
                # link; GSPMD propagates the sharding into the program
                bag, tables, _ = collate_batch(
                    self._dataset, padded,
                    level0_bucket=self.config.level0_bucket,
                    pads=self._pads, put=self._put)
                return bag_to_dict(bag), tables_to_dicts(tables)

            bag_d, tab_d = self._cached(padded, assemble)
            out = self._call(self._params, bag_d, tab_d)
        return np.asarray(out["pred"])[:n]

    def _cached(self, padded, assemble):
        """Device-resident LRU of collated batches keyed by slide
        indices: a repeat request skips collation + the feature H2D."""
        if not self._cache_batches:
            return assemble()
        key = tuple(padded)
        hit = self._batch_cache.pop(key, None)
        if hit is None:
            hit = assemble()
        self._batch_cache[key] = hit
        while len(self._batch_cache) > self._cache_batches:
            self._batch_cache.popitem(last=False)
        return hit

    def predict(self, slide_ids: Sequence[str]) -> List[dict]:
        """Predictions for `slide_ids`, in order. Survival rows carry
        `risk` (= -sum cumprod(1-h), reference `eval.py:59-64`) and
        per-bin `hazards`; subtype rows carry the argmax `pred` and
        per-class `probs`. Raises KeyError for unknown slides."""
        missing = [s for s in slide_ids if s not in self._index]
        if missing:
            raise KeyError(f"unknown slide ids (not in store): {missing}")
        indices = [self._index[s] for s in slide_ids]

        preds = []
        with self._lock:
            for s in range(0, len(indices), self.batch_size):
                preds.append(self._run(indices[s: s + self.batch_size]))
        pred = np.concatenate(preds) if preds else np.zeros((0,))

        return prediction_rows(self.config, slide_ids, pred)

    def info(self) -> dict:
        import jax

        return {
            "task": self.config.task,
            "model_dir": self.model_dir,
            "num_slides": len(self.slide_ids),
            "batch_size": self.batch_size,
            "backend": ("frozen-artifact" if self._exp is not None
                        and self._frozen else
                        "artifact" if self._exp is not None else
                        "live-streaming" if self._call is None else "live"),
            "device": str(jax.devices()[0]),
        }

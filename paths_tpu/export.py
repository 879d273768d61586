"""Serving export: freeze the trained hierarchical forward into a
portable StableHLO artifact via `jax.export`.

The reference has no serving story — inference only ever happens inside
the training script's eval loop (`train.py:106-116` in the reference).
A production deployment wants a *frozen, version-stable program*: one
file that any JAX process (or PJRT-compatible runtime) can load and run
without the model code, the config system, or the same framework
version. `jax.export` gives exactly that — StableHLO with a versioned
calling convention, portable across hosts and JAX releases.

Two artifact flavors:

- **weights-as-arguments** (default): `call(params, bag, tables)`.
  The artifact stores only the program (~100 KB); the serving host
  loads params from the checkpoint. Re-exporting on weight updates is
  unnecessary.
- **frozen** (`freeze_params=True`): weights are baked into the program
  as constants, `call(bag, tables)`. One self-contained file — the
  deployment unit for immutable model versions.

Only standard pytree containers (dicts / lists of arrays) cross the
export boundary: custom nodes (`PatchBag`, `LevelTable`) would need
`jax.export.register_pytree_node_serialization` on BOTH producer and
consumer, which defeats "loadable without the model code". The bag and
each level table travel as plain dicts of arrays instead.
"""
from __future__ import annotations

import json
from typing import List, Optional

import jax

from paths_tpu.config import Config
from paths_tpu.nn.core import Static

# Param pytrees carry `Static` metadata nodes (head counts etc.); the
# weights-as-args artifact serializes the params TREEDEF, so Static
# needs an export serialization. Values are JSON-able by construction
# in the model path (ints/strings); anything else fails loudly here
# rather than silently at serving time. The frozen artifact has no
# params argument and needs none of this on the consumer side.
try:
    jax.export.register_pytree_node_serialization(
        Static,
        serialized_name="paths_tpu.Static",
        serialize_auxdata=lambda v: json.dumps(v).encode(),
        deserialize_auxdata=lambda b: json.loads(b.decode()),
    )
except ValueError:
    pass  # already registered (repeat import under test runners)

BAG_FIELDS = ("fts", "locs", "mask", "parent_inds", "ctx_slide",
              "ctx_patch")
TABLE_FIELDS = ("fts", "locs", "count", "index", "grid_hw")


def bag_to_dict(bag) -> dict:
    return {f: getattr(bag, f) for f in BAG_FIELDS}


def tables_to_dicts(tables) -> List[dict]:
    return [{f: getattr(t, f) for f in TABLE_FIELDS} for t in tables]


def make_serving_fn(config: Config):
    """Prediction-only forward over plain-dict inputs.

    (params, bag: dict, tables: [dict]) ->
        {"pred", "logits", "importances"}

    `pred` is hazards (sigmoid) for survival or raw logits for subtype
    classification — the same contract as `end2end_loss`'s aux
    (`engine/hierarchy.py::task_loss`), minus the loss (serving has no
    labels).
    """
    from paths_tpu.engine.hierarchy import end2end_forward
    from paths_tpu.engine.tables import LevelTable
    from paths_tpu.models.batch import PatchBag

    def serve(params, bag: dict, tables: List[dict]):
        outs = end2end_forward(params, config,
                               PatchBag(**bag),
                               [LevelTable(**t) for t in tables])
        logits = outs[-1]["logits"]
        pred = (jax.nn.sigmoid(logits) if config.task == "survival"
                else logits)
        return {"pred": pred, "logits": logits,
                "importances": [o["importance"] for o in outs]}

    return serve


def export_serving(config: Config, params, bag, tables, *,
                   freeze_params: bool = False,
                   poly_batch: bool = False,
                   platforms: Optional[List[str]] = None) -> bytes:
    """Serialize the serving forward for the given input SHAPES.

    `bag`/`tables` are a representative batch (a `PatchBag` and
    `LevelTable` list, or the equivalent dicts) — only their avals
    matter. `platforms` defaults to the export host's platform; pass
    e.g. ["tpu", "cpu"] for a multi-platform artifact. With
    `poly_batch` the leading (batch) axis of every bag/table input is
    exported as a symbolic dimension, so ONE artifact serves any batch
    size (the patch/grid axes stay fixed — the trainer's static-shape
    contract).
    """
    serve = make_serving_fn(config)
    bag_d = bag if isinstance(bag, dict) else bag_to_dict(bag)
    tab_d = (tables if tables and isinstance(tables[0], dict)
             else tables_to_dicts(tables))
    if poly_batch:
        bag_d, tab_d = jax.export.symbolic_args_specs((bag_d, tab_d),
                                                      "b, ...")

    kw = {"platforms": platforms} if platforms else {}
    if freeze_params:
        frozen = jax.jit(lambda b, t: serve(params, b, t))
        exp = jax.export.export(frozen, **kw)(bag_d, tab_d)
    else:
        exp = jax.export.export(jax.jit(serve), **kw)(params, bag_d,
                                                      tab_d)
    return bytes(exp.serialize())


def load_serving(blob: bytes):
    """Deserialize an artifact; returns an object whose `.call(...)`
    runs the program (no model code needed)."""
    return jax.export.deserialize(blob)


def artifact_signature(exp) -> tuple:
    """(frozen, batch_size, pads) recovered from an artifact's inputs —
    the single place that knows the exported calling convention:
    `(params, bag, tables)` for weights-as-arguments artifacts,
    `(bag, tables)` when the weights were frozen in.

    `pads` is a `SlideDataset.global_pads()`-style dict; feed it to
    `collate_batch(..., level0_bucket=1, row_bucket=1, grid_bucket=1,
    pads=pads)` to collate arbitrary slides to EXACTLY the shapes the
    artifact was exported with. `batch_size` is None for a
    `poly_batch` artifact (symbolic leading axis — any batch works).
    """
    args, _kwargs = jax.tree_util.tree_unflatten(exp.in_tree,
                                                 exp.in_avals)
    bag, tables = args[-2], args[-1]
    assert set(bag) == set(BAG_FIELDS), sorted(bag)

    b, n0 = bag["mask"].shape
    rows = [0] + [t["fts"].shape[1] for t in tables]
    grid_hw = [(0, 0)] + [tuple(t["index"].shape[1:3]) for t in tables]
    batch = int(b) if isinstance(b, int) else None  # symbolic -> None
    return (len(args) == 2, batch,
            {"n0": int(n0), "rows": rows, "grid_hw": grid_hw})


def artifact_pads(exp) -> tuple:
    """(batch_size, pads) — see `artifact_signature`."""
    _, batch, pads = artifact_signature(exp)
    return batch, pads

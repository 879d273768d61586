"""Import rig for running the ACTUAL reference code (/root/reference) as a
test oracle.

The reference is torch/CPU-runnable here except for four dependencies that
are not installed (wandb, tiatoolbox, timm, torchvision); none of them are
exercised by the code paths the oracle tests drive (preprocessed-slide
recursion, rendering), so they are stubbed with empty modules carrying just
the names the reference imports at module scope. The stubs and the
reference modules are removed from sys.modules afterwards so nothing fake
leaks into other tests.

Used by test_heatmap_reference_oracle.py (figure pipeline) and
test_reference_engine_oracle.py (model + inference_end2end + loss/grads).
"""
import contextlib
import importlib
import os
import sys
import types

REFERENCE_DIR = "/root/reference"

# every reference module an oracle test may pull in (directly or
# transitively) — tracked so the rig can restore sys.modules exactly
_REF_MODULES = [
    "utils", "config", "eval", "heatmap_visualise",
    "data_utils", "data_utils.slide", "data_utils.patch_batch",
    "data_utils.dataset",
    "model", "model.interface", "model.paths", "model.aggregator",
    "model.image_encoder",
    "preprocess", "preprocess.loader",
]


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REFERENCE_DIR, "config.py"))


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _make_stubs():
    cls = type("_Missing", (), {})
    stubs = {
        "wandb": _stub("wandb"),
        "tiatoolbox": _stub("tiatoolbox"),
        "tiatoolbox.wsicore": _stub("tiatoolbox.wsicore"),
        "tiatoolbox.wsicore.wsireader": _stub(
            "tiatoolbox.wsicore.wsireader", WSIReader=cls),
        "tiatoolbox.tools": _stub("tiatoolbox.tools"),
        "tiatoolbox.tools.tissuemask": _stub(
            "tiatoolbox.tools.tissuemask", OtsuTissueMasker=cls),
        "timm": _stub("timm", create_model=None),
        "timm.layers": _stub("timm.layers", SwiGLUPacked=cls),
        "timm.data": _stub("timm.data", resolve_data_config=None),
        "timm.data.transforms_factory": _stub(
            "timm.data.transforms_factory", create_transform=None),
        "torchvision": _stub("torchvision"),
        "torchvision.models": _stub("torchvision.models"),
        "torchvision.models.resnet": _stub(
            "torchvision.models.resnet", resnet18=None, resnet50=None,
            ResNet18_Weights=cls, ResNet50_Weights=cls),
        "torchvision.transforms": _stub(
            "torchvision.transforms",
            v2=_stub("torchvision.transforms.v2", Compose=cls)),
        "torchvision.transforms.functional": _stub(
            "torchvision.transforms.functional"),
    }
    stubs["torchvision.transforms.v2"] = stubs["torchvision.transforms"].v2
    stubs["torchvision.models"].resnet = stubs["torchvision.models.resnet"]
    return stubs


@contextlib.contextmanager
def reference_modules(*names):
    """Context manager yielding the imported reference modules by name.

    Example:
        with reference_modules("utils", "config") as (utils, config): ...
    """
    stubs = _make_stubs()
    saved = {n: sys.modules.get(n)
             for n in list(stubs) + _REF_MODULES}
    before = set(sys.modules)  # catch transitive imports beyond the list
    sys.modules.update(stubs)
    sys.path.insert(0, REFERENCE_DIR)
    try:
        yield tuple(importlib.import_module(n) for n in names)
    finally:
        sys.path.remove(REFERENCE_DIR)
        # drop every module the block added THAT CAME FROM THE REFERENCE
        # CHECKOUT (the reference uses generic top-level names — utils,
        # config, model — that would otherwise shadow same-named imports
        # in later tests), then restore what we replaced. Modules merely
        # first-imported inside the block from elsewhere (paths_tpu.*,
        # torch/scipy submodules pulled in lazily) must SURVIVE: purging
        # them would make a later re-import create a duplicate module
        # object while old references to the first still exist.
        for n in set(sys.modules) - before:
            mod = sys.modules.get(n)
            f = getattr(mod, "__file__", None) or ""
            if f.startswith(REFERENCE_DIR) or n in _REF_MODULES:
                sys.modules.pop(n, None)
        for n, old in saved.items():
            if old is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = old

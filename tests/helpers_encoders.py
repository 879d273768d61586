"""Torch mirrors of timm ViT blocks and torchvision resnets for encoder
parity tests. The implementations live in the package
(`paths_tpu.encoders.torch_mirror`) so the verify-conversion CLI can use
them as the drop-in-weights oracle; this module keeps the historical test
import path."""
from paths_tpu.encoders.torch_mirror import (  # noqa: F401
    BasicBlock,
    Bottleneck,
    LayerScale,
    TimmAttention,
    TimmBlock,
    TimmMlp,
    TimmViT,
    TorchResNet18,
    TorchResNet50,
    timm_vit_mirror,
)

"""Flax model layer: tokenizers, RoPE, attention, ViT, preprocessors, builder."""

from vit_tpu.models.builder import (  # noqa: F401
    VitConfig,
    build_model_name,
    get_model,
    get_vit_config,
)
from vit_tpu.models.vit import SpecViT, compute_loss  # noqa: F401

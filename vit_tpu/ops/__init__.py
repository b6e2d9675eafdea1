"""Pallas TPU kernels for the hot ops."""

from vit_tpu.ops.flash_attention import flash_attention  # noqa: F401

"""vit_tpu — a TPU-native JAX/Flax framework for training Vision Transformers
on 1-D stellar spectra and 2-D images.

Re-designed TPU-first rebuild of the capabilities of the ViskaWei/VIT
reference (a PyTorch-Lightning "Minimal ViT Launcher"): pluggable patch
tokenizers, linear preprocessors built from covariance statistics (PCA /
ZCA / eigenvector-prefilled attention) with epoch-scheduled freezing,
optional RoPE attention, a jit-compiled train/eval loop with data
parallelism over a `jax.sharding.Mesh`, a vmapped parallel LR/scheduler
sweep, offline PCA/KPCA/ZCA/PCP/CKA statistics factories, and a
visualization/diagnostics subsystem.

Layout:
    vit_tpu.config    — YAML config loading (env expansion, W&B flattening)
    vit_tpu.data      — HDF5 spectra datasets, synthetic fixtures, prefetch
    vit_tpu.models    — Flax modules: tokenizers, RoPE, attention, ViT, builder
    vit_tpu.ops       — Pallas TPU kernels (flash attention)
    vit_tpu.train     — optax factory, jit train/eval loop, metrics, checkpoints
    vit_tpu.parallel  — mesh construction and sharding rules
    vit_tpu.prepca    — offline covariance/PCA/KPCA/ZCA/PCP/CKA statistics
    vit_tpu.opt       — parallel hyperparameter sweeps (vmapped replicas)
    vit_tpu.viz       — training diagnostics, regression reports, GIFs
    vit_tpu.serve     — batch inference (perf preset, int8, data-parallel)
    vit_tpu.export    — AOT serving artifacts (jax.export StableHLO files)
"""

__version__ = "0.1.0"

from vit_tpu.config import load_config  # noqa: F401

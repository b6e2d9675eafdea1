"""Hash-based dropout: counter-based masks without PRNG state.

Dropout-mask generation dominates small-model step time (measured on the
baseline workload: ~24 ms of a ~100 ms epoch with the rbg PRNG, ~11 ms
recovered by this module). Instead of drawing random bits from a stateful
generator, the keep-mask is a pure function of (per-call seed, element
coordinates) — a murmur-style integer hash (same construction as the flash
kernel's in-kernel dropout, :mod:`vit_tpu.ops.flash_attention`). XLA fuses
the handful of uint32 elementwise ops into the surrounding computation; no
RNG state is threaded, carried, or serialized.

Semantics: standard inverted dropout — each element kept with probability
``1-rate`` and scaled by ``1/(1-rate)``; the mask is deterministic in the
RNG key Flax supplies (so a fixed seed reproduces training exactly), and
distinct call sites get distinct masks because ``make_rng`` folds the
module path into the key. The *stream* differs from ``nn.Dropout`` — RNG
parity in this rebuild is semantic, not bitwise (README "Intentional
differences").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_tpu.ops.flash_attention import _M1, _fmix32, _keep_threshold

__all__ = ["hash_dropout", "HashDropout"]

# distinct ODD multipliers per axis (splitmix64/murmur-style constants);
# odd is required — an even multiplier discards the operand's high bit(s),
# collapsing distinct seeds/coordinates onto the same mask stream.
_AXIS_MULTS = (0x9E3779B1, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F,
               0x165667B1, 0xD3A2646D)
_SEED_MULT = 0x7FEB352D  # odd, and not shared with any axis


def _coord_hash(shape, seed, offsets=None):
    """uint32 hash of each element's coordinates, mixed with ``seed``.

    Per-axis mixing decorrelates (i, j) from (j, i); the final avalanche is
    the murmur3 finalizer shared with the flash kernel's in-kernel dropout
    (one implementation of the hash-quality-critical mix).

    ``offsets`` (optional, one int32 scalar per axis, traced values allowed)
    shifts each axis's coordinates — this is how a SHARD of a logically
    larger tensor (e.g. one device's block of the global attention-probs
    matrix under ring attention) draws the same mask it would get unsharded.
    """
    u32 = lambda v: jax.lax.convert_element_type(v, jnp.uint32)  # noqa: E731
    if len(shape) > len(_AXIS_MULTS):
        raise ValueError(f"hash_dropout supports up to {len(_AXIS_MULTS)} dims")
    x = u32(seed) * np.uint32(_SEED_MULT)
    for axis, mult in zip(range(len(shape)), _AXIS_MULTS):
        idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        if offsets is not None and offsets[axis] is not None:
            idx = idx + jnp.asarray(offsets[axis], jnp.int32)
        x = x + u32(idx) * np.uint32(mult)
        # mix between axes so (i, j) and (j, i) decorrelate
        x = x ^ (x >> 15)
        x = x * np.uint32(_M1)
    return _fmix32(x)


def hash_keep_mask(shape, rate: float, seed, offsets=None) -> jnp.ndarray:
    """Inverted-dropout keep mask (``1/(1-rate)`` or 0) for a coordinate
    block at ``offsets`` of a logically larger tensor."""
    keep = 1.0 - float(rate)
    bits = _coord_hash(shape, seed, offsets)
    return jnp.where(bits < _keep_threshold(rate), 1.0 / keep, 0.0)


def hash_dropout(x: jnp.ndarray, rate: float, seed) -> jnp.ndarray:
    """Inverted dropout with a counter-based mask; ``seed``: int32 scalar."""
    if rate <= 0.0:
        return x
    if rate >= 1.0:  # nn.Dropout parity: rate 1 drops everything
        return jnp.zeros_like(x)
    bits = _coord_hash(x.shape, seed)
    keep = 1.0 - float(rate)
    mask = jnp.where(bits < _keep_threshold(rate), 1.0 / keep, 0.0)
    return x * mask.astype(x.dtype)


def _key_to_seed(key) -> jnp.ndarray:
    """Fold a PRNG key's raw words into one int32 seed (no bit generation)."""
    kd = jax.random.key_data(key).reshape(-1)
    folded = kd[0]
    for i in range(1, kd.shape[0]):
        folded = folded ^ kd[i]
    return jax.lax.convert_element_type(folded, jnp.int32)


class HashDropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` with hash-generated masks.

    Uses the ``dropout`` RNG collection exactly like ``nn.Dropout`` (so the
    call-site API and reproducibility-from-seed are unchanged) but derives
    a scalar seed from the key words instead of generating random bits.
    ``deterministic`` follows ``nn.Dropout``'s merge_param contract: it must
    be supplied either as a module attribute or a call argument — omitting
    both raises instead of silently disabling dropout.
    """

    rate: float
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: Optional[bool] = None
    ) -> jnp.ndarray:
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if deterministic or self.rate <= 0.0:
            return x
        return hash_dropout(x, self.rate, _key_to_seed(self.make_rng("dropout")))

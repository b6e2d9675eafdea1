"""Mixture-of-Experts MLP with expert parallelism (GShard-style dispatch).

Beyond-reference scaling capability (the reference has no MoE; SURVEY §2.9
lists expert parallelism as absent): ``model.moe_experts: E`` replaces each
encoder layer's dense MLP with ``E`` expert MLPs and a learned top-k router,
multiplying parameter capacity at near-constant per-token FLOPs.

TPU-idiomatic formulation — the grouped dense-dispatch einsums of
GShard/Switch rather than data-dependent gather/scatter, so XLA sees static
shapes and pure matmuls:

* Router: fp32 softmax over ``E`` logits per token; ``top_k`` (1 = Switch,
  2 = GShard, any k <= E supported) experts per token. Gate values are
  renormalized over the chosen k only for k >= 2 (GShard); k = 1 uses the
  raw top-1 probability (Switch), which keeps the task-loss gradient
  flowing into the router. ``model.moe_router_jitter`` (Switch recipe)
  multiplies the router INPUT by uniform noise in ``[1-j, 1+j]`` during
  training only; ``model.moe_z_weight`` adds the router z-loss
  ``mean(logsumexp(logits)^2)`` (ST-MoE eq. 5) to keep logits bounded —
  sown as ``moe_z`` and weighted by the training objective
  (:func:`vit_tpu.train.loop.make_train_forward`).
* Capacity: each expert accepts at most ``C = ceil(top_k * T * cf / E)``
  tokens per batch row (``cf = moe_capacity_factor``); overflow tokens are
  dropped for that expert (their k-slot contributes zero — standard Switch
  behavior; raise ``cf`` for exactness). Priority is GShard's: every token's
  first choice is queued before any token's second choice, earlier tokens
  first.
* Dispatch/combine: one-hot ``(B, T, E, C)`` tensors turn routing into two
  einsums around a batched per-expert MLP ``(E, B, C, D)`` — all MXU work.
* Load-balance auxiliary loss (Switch eq. 4): ``E * Σ_e f_e · P_e`` with
  ``f_e`` the fraction of tokens whose FIRST choice is ``e`` and ``P_e``
  the mean router probability; sown into the ``losses`` collection and
  added to the training objective with weight ``model.moe_aux_weight``
  (monitored eval losses exclude it — it is a regularizer).

Expert parallelism: the expert-stacked parameters ``wi/wo (E, ·, ·)`` are
sharded over the mesh ``model`` axis (``infer_param_shardings`` rule) —
with ``train.model_parallel: K`` each device holds ``E/K`` experts and
GSPMD inserts the token all-to-alls around the expert einsums.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_tpu.models.tokenization import KERNEL_INIT

__all__ = ["MoEMLP", "moe_capacity"]


def moe_capacity(seq_len: int, num_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Per-row expert capacity: ``ceil(top_k * T * cf / E)``, at least 1."""
    return max(
        1, int(math.ceil(top_k * seq_len * capacity_factor / num_experts))
    )


def _expert_init(base, dtype=jnp.float32):
    """Stack one ``base`` draw per expert so each expert's fan-in matches a
    plain ``nn.Dense`` of the same shape (a single draw over the stacked
    (E, din, dout) shape would scale by the wrong fan-in)."""

    def init(key, shape, dtype=dtype):
        keys = jax.random.split(key, shape[0])
        return jnp.stack([base(k, shape[1:], dtype) for k in keys])

    return init


class MoEMLP(nn.Module):
    """Drop-in MoE replacement for the encoder MLP (``intermediate`` +
    ``output`` dense pair). Input/output: ``(B, T, D)``."""

    cfg: Any  # VitConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        b, t, d = x.shape
        num_experts = int(cfg.moe_experts)
        top_k = int(getattr(cfg, "moe_top_k", 1) or 1)
        if top_k < 1 or top_k > num_experts:
            raise ValueError(
                f"moe_top_k={top_k} must be in [1, moe_experts={num_experts}]"
            )
        cap = moe_capacity(
            t, num_experts, top_k,
            float(getattr(cfg, "moe_capacity_factor", 1.25) or 1.25),
        )

        # Router in fp32: softmax/top_k stability is worth more than the
        # (B, T, E) matmul's dtype.
        router_in = x.astype(jnp.float32)
        jitter = float(getattr(cfg, "moe_router_jitter", 0.0) or 0.0)
        if jitter > 0.0 and not deterministic:
            # Switch-style input jitter: training-only multiplicative noise
            # decorrelates near-tied routing decisions.
            key = self.make_rng("dropout")
            router_in = router_in * jax.random.uniform(
                key, router_in.shape, jnp.float32, 1.0 - jitter, 1.0 + jitter
            )
        logits = nn.Dense(
            num_experts, dtype=jnp.float32, kernel_init=KERNEL_INIT,
            name="router",
        )(router_in)
        probs = jax.nn.softmax(logits, axis=-1)  # (B, T, E)
        gate_vals, gate_idx = jax.lax.top_k(probs, top_k)  # (B, T, k)
        if top_k > 1:
            gate_vals = gate_vals / jnp.maximum(
                gate_vals.sum(-1, keepdims=True), 1e-9
            )
        # top_k == 1 keeps the RAW top-1 probability as the gate (Switch
        # Transformer): renormalizing over k=1 would make the gate a
        # constant 1.0 and cut the task-loss gradient into the router,
        # leaving it trained only by the aux loss (balanced but
        # content-blind routing).
        sel = jax.nn.one_hot(gate_idx, num_experts, dtype=jnp.float32)

        # GShard priority: (B, T, k, E) -> (B, k*T, E) with ALL first
        # choices queued before any second choice, earlier tokens first.
        sel_prio = sel.transpose(0, 2, 1, 3).reshape(b, top_k * t, num_experts)
        pos = jnp.cumsum(sel_prio, axis=1) - 1.0  # queue position per expert
        keep = (pos < cap) * sel_prio
        slot = jax.nn.one_hot(
            jnp.clip(pos, 0, cap - 1).astype(jnp.int32), cap, dtype=jnp.float32
        ) * keep[..., None]  # (B, kT, E, C)
        slot_k = slot.reshape(b, top_k, t, num_experts, cap)
        dispatch = slot_k.sum(1)  # (B, T, E, C): a token's chosen slots
        combine = (
            slot_k * gate_vals.transpose(0, 2, 1)[..., None, None]
        ).sum(1)  # gate-weighted (B, T, E, C)

        dt = cfg.dtype
        inter = cfg.intermediate_size
        wi = self.param(
            "wi", _expert_init(KERNEL_INIT), (num_experts, d, inter)
        )
        wi_bias = self.param(
            "wi_bias", nn.initializers.zeros, (num_experts, inter)
        )
        wo = self.param(
            "wo", _expert_init(KERNEL_INIT), (num_experts, inter, d)
        )
        wo_bias = self.param("wo_bias", nn.initializers.zeros, (num_experts, d))

        expert_in = jnp.einsum(
            "btec,btd->ebcd", dispatch.astype(dt), x.astype(dt)
        )  # (E, B, C, D)
        h = jnp.einsum("ebcd,edf->ebcf", expert_in, wi.astype(dt))
        h = h + wi_bias.astype(dt)[:, None, None, :]
        h = nn.gelu(h, approximate=getattr(cfg, "gelu_approximate", False))
        h = jnp.einsum("ebcf,efd->ebcd", h, wo.astype(dt))
        h = h + wo_bias.astype(dt)[:, None, None, :]
        y = jnp.einsum("btec,ebcd->btd", combine.astype(dt), h)

        # Switch load-balance loss: fraction of FIRST choices per expert
        # times mean router probability, scaled by E (uniform routing -> 1).
        first_frac = sel[:, :, 0, :].mean(axis=1)  # (B, E)
        mean_prob = probs.mean(axis=1)  # (B, E)
        aux = num_experts * (first_frac * mean_prob).sum(-1).mean()
        self.sow("losses", "moe_aux", aux)
        if float(getattr(cfg, "moe_z_weight", 0.0) or 0.0) > 0.0:
            # Router z-loss (ST-MoE): penalize large logits so the fp32
            # softmax stays well-conditioned. Sown only when enabled — the
            # `losses` collection otherwise carries exactly the aux values
            # older tests/tools index by position.
            z = jax.nn.logsumexp(logits, axis=-1)
            self.sow("losses", "moe_z", jnp.mean(z * z))
        # Observability: fraction of (token, slot) assignments dropped by
        # the capacity limit — the tuning signal for moe_capacity_factor,
        # logged per epoch as `moe_dropped_frac` by the Experiment.
        self.sow(
            "moe_stats", "dropped_frac",
            1.0 - keep.sum() / jnp.float32(b * t * top_k),
        )
        return y

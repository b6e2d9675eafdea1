"""Torch state-dict bridge: Flax params <-> reference (HF ViT) checkpoints.

North-star requirement: checkpoints interchangeable at the state-dict level
with the reference's ``MyViT`` (`/root/reference/src/models/specvit.py`),
which is an HF ``ViTModel`` with ``SpectraEmbeddings`` and Linear heads.

Because the naming mirrors HF's ``ViTForImageClassification`` (``vit.`` +
``classifier``), full pretrained HF image-ViT state dicts (e.g.
vit-base-patch16-224 .pt exports) load directly into the image family —
verified numerically end-to-end in ``tests/test_torch_bridge.py``.

Name mapping (torch key <- flax path):

* ``vit.embeddings.cls_token``                      <- ``embeddings/cls_token``
* ``vit.embeddings.position_embeddings``            <- ``embeddings/position_embeddings``
* ``vit.embeddings.patch_embeddings.projection.*``  <- ``embeddings/patch_embeddings/projection``
  (Linear: kernel (in,out) <-> weight (out,in); Conv1d: kernel (P,1,H) <->
  weight (H,1,P))
* ``vit.encoder.layer.{i}.attention.attention.{query,key,value}.*``
                                                    <- ``encoder/layer_i/attention/{query,key,value}``
* ``vit.encoder.layer.{i}.attention.output.dense.*`` <- ``encoder/layer_i/attention/out``
* ``vit.encoder.layer.{i}.intermediate.dense.*``     <- ``encoder/layer_i/intermediate``
* ``vit.encoder.layer.{i}.output.dense.*``           <- ``encoder/layer_i/output``
* ``vit.encoder.layer.{i}.layernorm_{before,after}.*`` <- LayerNorm scale/bias
* ``vit.layernorm.*``                                <- final ``layernorm``
* ``classifier.* | regressor.*``                     <- task head
* ``preprocessor.linear.*``                          <- ``preprocessor`` (LinearPreprocessor
  wraps ``PrefilledLinear`` named ``linear`` in the reference, `preprocessor.py:93-111`)
* ``preprocessor.{q_lin,k_lin,v_lin}.*``             <- ``PrefilledAttention``

Functions return/accept plain ``{name: np.ndarray}`` dicts; use
``save_torch_checkpoint`` / ``load_torch_checkpoint`` for ``.pt`` files.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = [
    "to_torch_state_dict",
    "from_torch_state_dict",
    "save_torch_checkpoint",
    "load_torch_checkpoint",
]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _dense_out(prefix: str, node: dict, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.weight"] = _np(node["kernel"]).T  # (in,out) -> (out,in)
    if "bias" in node:
        out[f"{prefix}.bias"] = _np(node["bias"])


def _ln_out(prefix: str, node: dict, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.weight"] = _np(node["scale"])
    out[f"{prefix}.bias"] = _np(node["bias"])


def to_torch_state_dict(params: Dict[str, Any], vit_config) -> Dict[str, np.ndarray]:
    """Flax param tree -> reference torch state-dict (numpy values)."""
    if getattr(vit_config, "moe_experts", 0) > 1:
        raise ValueError(
            "MoE models (model.moe_experts > 1) have no reference/HF ViT "
            "counterpart — the expert-stacked MLP cannot map to the "
            "intermediate/output dense pair. Export is only defined for "
            "the dense family."
        )
    out: Dict[str, np.ndarray] = {}

    emb = params["embeddings"]
    out["vit.embeddings.cls_token"] = _np(emb["cls_token"])
    if "position_embeddings" in emb:
        out["vit.embeddings.position_embeddings"] = _np(emb["position_embeddings"])
    proj = emb["patch_embeddings"]["projection"]
    kernel = _np(proj["kernel"])
    if kernel.ndim == 2:  # SW / Linear tokenizer
        out["vit.embeddings.patch_embeddings.projection.weight"] = kernel.T
    elif kernel.ndim == 3:  # Conv1d: flax (P, in, H) -> torch (H, in, P)
        out["vit.embeddings.patch_embeddings.projection.weight"] = kernel.transpose(2, 1, 0)
    else:  # Conv2d image patchify: flax (kh, kw, in, H) -> torch (H, in, kh, kw)
        out["vit.embeddings.patch_embeddings.projection.weight"] = kernel.transpose(3, 2, 0, 1)
    if "bias" in proj:
        out["vit.embeddings.patch_embeddings.projection.bias"] = _np(proj["bias"])

    enc = params["encoder"]
    n_layers = vit_config.num_hidden_layers
    for i in range(n_layers):
        layer = enc[f"layer_{i}"]
        tp = f"vit.encoder.layer.{i}"
        attn = layer["attention"]
        for name in ("query", "key", "value"):
            _dense_out(f"{tp}.attention.attention.{name}", attn[name], out)
        _dense_out(f"{tp}.attention.output.dense", attn["out"], out)
        _dense_out(f"{tp}.intermediate.dense", layer["intermediate"], out)
        _dense_out(f"{tp}.output.dense", layer["output"], out)
        _ln_out(f"{tp}.layernorm_before", layer["layernorm_before"], out)
        _ln_out(f"{tp}.layernorm_after", layer["layernorm_after"], out)

    _ln_out("vit.layernorm", params["layernorm"], out)

    head_name = "classifier" if vit_config.task_type == "cls" else "regressor"
    if head_name in params:
        _dense_out(head_name, params[head_name], out)

    if "preprocessor" in params:
        pre = params["preprocessor"]
        if "kernel" in pre:  # LinearPreprocessor
            out["preprocessor.linear.weight"] = _np(pre["kernel"]).T
            if "bias" in pre:
                out["preprocessor.linear.bias"] = _np(pre["bias"])
        else:  # PrefilledAttention
            for name in ("q_lin", "k_lin", "v_lin"):
                if name in pre:
                    _dense_out(f"preprocessor.{name}", pre[name], out)
    return out


def _dense_in(prefix: str, sd: Dict[str, np.ndarray], node: dict) -> dict:
    new = dict(node)
    new["kernel"] = _np(sd[f"{prefix}.weight"]).T
    if f"{prefix}.bias" in sd and "bias" in node:
        new["bias"] = _np(sd[f"{prefix}.bias"])
    return new


def _ln_in(prefix: str, sd: Dict[str, np.ndarray], node: dict) -> dict:
    return dict(node, scale=_np(sd[f"{prefix}.weight"]), bias=_np(sd[f"{prefix}.bias"]))


def from_torch_state_dict(
    state_dict: Dict[str, Any], params: Dict[str, Any], vit_config
) -> Dict[str, Any]:
    """Reference torch state-dict -> Flax param tree (template ``params``
    supplies structure/dtypes; returns a new tree)."""
    if getattr(vit_config, "moe_experts", 0) > 1:
        raise ValueError(
            "MoE models (model.moe_experts > 1) cannot import dense "
            "reference/HF checkpoints — the expert-stacked MLP has no "
            "source weights there."
        )
    sd = {k: _np(v) for k, v in state_dict.items()}
    import jax

    params = jax.tree_util.tree_map(_np, params)  # plain numpy copy

    emb = dict(params["embeddings"])
    emb["cls_token"] = sd["vit.embeddings.cls_token"]
    if "position_embeddings" in emb and "vit.embeddings.position_embeddings" in sd:
        emb["position_embeddings"] = sd["vit.embeddings.position_embeddings"]
    proj = dict(emb["patch_embeddings"]["projection"])
    w = sd["vit.embeddings.patch_embeddings.projection.weight"]
    tmpl = np.asarray(proj["kernel"])
    if tmpl.ndim == 2:
        proj["kernel"] = w.T
    elif tmpl.ndim == 3:
        proj["kernel"] = w.transpose(2, 1, 0)
    else:
        proj["kernel"] = w.transpose(2, 3, 1, 0)
    if "vit.embeddings.patch_embeddings.projection.bias" in sd and "bias" in proj:
        proj["bias"] = sd["vit.embeddings.patch_embeddings.projection.bias"]
    emb["patch_embeddings"] = {"projection": proj}
    params["embeddings"] = emb

    enc = dict(params["encoder"])
    for i in range(vit_config.num_hidden_layers):
        layer = dict(enc[f"layer_{i}"])
        tp = f"vit.encoder.layer.{i}"
        attn = dict(layer["attention"])
        for name in ("query", "key", "value"):
            attn[name] = _dense_in(f"{tp}.attention.attention.{name}", sd, attn[name])
        attn["out"] = _dense_in(f"{tp}.attention.output.dense", sd, attn["out"])
        layer["attention"] = attn
        layer["intermediate"] = _dense_in(f"{tp}.intermediate.dense", sd, layer["intermediate"])
        layer["output"] = _dense_in(f"{tp}.output.dense", sd, layer["output"])
        layer["layernorm_before"] = _ln_in(f"{tp}.layernorm_before", sd, layer["layernorm_before"])
        layer["layernorm_after"] = _ln_in(f"{tp}.layernorm_after", sd, layer["layernorm_after"])
        enc[f"layer_{i}"] = layer
    params["encoder"] = enc

    params["layernorm"] = _ln_in("vit.layernorm", sd, params["layernorm"])

    head_name = "classifier" if vit_config.task_type == "cls" else "regressor"
    if head_name in params and f"{head_name}.weight" in sd:
        params[head_name] = _dense_in(head_name, sd, params[head_name])

    if "preprocessor" in params:
        pre = dict(params["preprocessor"])
        if "kernel" in pre and "preprocessor.linear.weight" in sd:
            pre["kernel"] = sd["preprocessor.linear.weight"].T
            if "bias" in pre and "preprocessor.linear.bias" in sd:
                pre["bias"] = sd["preprocessor.linear.bias"]
        else:
            for name in ("q_lin", "k_lin", "v_lin"):
                if name in pre and f"preprocessor.{name}.weight" in sd:
                    pre[name] = _dense_in(f"preprocessor.{name}", sd, pre[name])
        params["preprocessor"] = pre
    return params


def save_torch_checkpoint(params: Dict[str, Any], vit_config, path: str) -> str:
    """Export params as a torch ``.pt`` state dict loadable by the reference."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in to_torch_state_dict(params, vit_config).items()
    }
    torch.save(sd, path)
    return path


def load_torch_checkpoint(path: str, params: Dict[str, Any], vit_config) -> Dict[str, Any]:
    """Import a torch state-dict checkpoint into a Flax param tree.

    Accepts raw state dicts and Lightning checkpoints (``state_dict`` key,
    with the reference's ``model.`` prefix from ``ViTLModule``).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    # Strip a Lightning "model." prefix if present.
    if raw and all(k.startswith("model.") for k in raw):
        raw = {k[len("model."):]: v for k, v in raw.items()}
    return from_torch_state_dict(raw, params, vit_config)

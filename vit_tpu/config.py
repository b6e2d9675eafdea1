"""Config loading and manipulation.

Behavioral parity with the reference's config layer
(`/root/reference/src/utils.py:311-359` ``load_config`` and
`/root/reference/scripts/sweep.py:29-50` dotted-key overrides):

* YAML file -> nested dict.
* Every string value gets ``os.path.expandvars`` + ``os.path.expanduser``
  applied recursively, so configs may reference ``${TRAIN_DIR}`` etc.
* Two W&B-export formats are transparently flattened:
  1. a top-level ``config: {value: {...}}`` wrapper, and
  2. per-key ``{value: ...}`` / ``{desc: ..., value: ...}`` wrappers
  (the ``_wandb`` bookkeeping key is dropped).
* ``deep_set`` applies dotted-key overrides (``model.patch_size``) onto the
  nested dict, used by sweep agents and CLI flags.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Mapping

import yaml

__all__ = [
    "load_config",
    "expand_config",
    "flatten_wandb_config",
    "deep_set",
    "deep_get",
    "deep_update",
    "save_config",
    "normalize_task",
]


def normalize_task(config: Mapping, task_type: Any = None) -> str:
    """('cls'|'reg') from ``model.task_type`` or the legacy ``model.task``
    key, default 'cls' (`/root/reference/src/vit.py:21-27` /
    `builder.py:204`). The ONE implementation shared by the model builder
    and the dataset selector — a mismatch pairs a cls head with reg labels.
    """
    m = (config.get("model", {}) or {}) if isinstance(config, Mapping) else {}
    task = str(task_type or m.get("task_type") or m.get("task") or "cls").lower()
    return "cls" if task in ("cls", "class", "classification") else "reg"


def _expand(value: Any) -> Any:
    """Recursively expand env vars / ``~`` in all string leaves."""
    if isinstance(value, str):
        return os.path.expanduser(os.path.expandvars(value))
    if isinstance(value, dict):
        return {k: _expand(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_expand(v) for v in value]
    return value


def expand_config(config: dict) -> dict:
    """Return a copy of ``config`` with env vars expanded in every string."""
    return _expand(config)


def _is_wandb_value_wrapper(v: Any) -> bool:
    """True for W&B-export per-key wrappers: ``{value: ...}`` possibly with
    ``desc``."""
    return (
        isinstance(v, dict)
        and "value" in v
        and set(v.keys()) <= {"value", "desc"}
    )


def flatten_wandb_config(config: dict) -> dict:
    """Flatten the two W&B config-export formats into a plain nested dict.

    Mirrors the reference's transparent unwrap of (a) a whole-config
    ``{"config": {"value": {...}}}`` wrapper and (b) per-key
    ``{"value": ...}`` wrappers, dropping ``_wandb`` metadata.
    """
    if not isinstance(config, dict):
        return config
    # Format (a): the full config nested under config.value
    if "config" in config and _is_wandb_value_wrapper(config.get("config")):
        inner = config["config"]["value"]
        if isinstance(inner, dict):
            return flatten_wandb_config(inner)
    # Format (b): every (or some) top-level key wrapped as {value: ...}
    if any(_is_wandb_value_wrapper(v) for v in config.values()):
        out = {}
        for k, v in config.items():
            if k == "_wandb":
                continue
            out[k] = v["value"] if _is_wandb_value_wrapper(v) else v
        return out
    return config


def load_config(path: str) -> dict:
    """Load a YAML config: read, flatten W&B wrappers, expand env vars."""
    path = os.path.expanduser(os.path.expandvars(str(path)))
    with open(path, "r") as f:
        config = yaml.safe_load(f) or {}
    if not isinstance(config, dict):
        raise ValueError(f"Config root must be a mapping, got {type(config)}: {path}")
    config = flatten_wandb_config(config)
    return expand_config(config)


def deep_set(config: dict, dotted_key: str, value: Any) -> dict:
    """Set ``config['a']['b']['c'] = value`` from ``'a.b.c'`` in place.

    Intermediate mappings are created as needed (reference sweep-agent
    semantics: overrides may introduce new sections).
    """
    keys = dotted_key.split(".")
    node = config
    for k in keys[:-1]:
        nxt = node.get(k)
        if not isinstance(nxt, dict):
            nxt = {}
            node[k] = nxt
        node = nxt
    node[keys[-1]] = value
    return config


def deep_get(config: Mapping, dotted_key: str, default: Any = None) -> Any:
    """Get ``config['a']['b']['c']`` from ``'a.b.c'``; ``default`` if absent."""
    node: Any = config
    for k in dotted_key.split("."):
        if not isinstance(node, Mapping) or k not in node:
            return default
        node = node[k]
    return node


def deep_update(base: dict, overrides: Mapping) -> dict:
    """Recursively merge ``overrides`` into a deep copy of ``base``."""
    out = copy.deepcopy(base)

    def _merge(dst: dict, src: Mapping) -> None:
        for k, v in src.items():
            if isinstance(v, Mapping) and isinstance(dst.get(k), dict):
                _merge(dst[k], v)
            else:
                dst[k] = copy.deepcopy(v) if isinstance(v, (dict, list)) else v

    _merge(out, overrides)
    return out


def save_config(config: dict, path: str) -> None:
    """Write a config dict as YAML (used for sweep artifacts)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config, f, default_flow_style=False, sort_keys=False)

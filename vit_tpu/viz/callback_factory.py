"""Viz monitor construction from the ``viz`` config section.

Parity with `/root/reference/src/viz/callback_factory.py:7-84`
(``create_viz_callbacks``): builds the GIF diagnostics (+ CKA monitor when
``viz.compute_cka``, default True) honoring epoch/step logging frequency;
local artifact writing follows ``train.save``.
"""

from __future__ import annotations

from typing import Optional, Tuple

from vit_tpu.viz.diagnostics import CKAMonitor, VizDiagnostics

__all__ = ["create_viz_callbacks"]


def create_viz_callbacks(
    viz_cfg: Optional[dict],
    save_enabled: bool = True,
    model_name: str = "model",
    param_names: Optional[list] = None,
    denormalize=None,
    label_bounds: Optional[list] = None,
) -> Tuple[Optional[VizDiagnostics], Optional[CKAMonitor], int, int]:
    """Returns (viz, cka, log_every_n_epochs, log_every_n_steps).

    ``(None, None, 0, 0)`` when disabled. Step frequency (reference
    ``callback_factory.py:18-84``) takes precedence when set: the loop
    captures diagnostics every N optimizer steps on the per-step path, and
    rounds to the nearest epoch boundary in fused-epoch mode (a whole epoch
    is one dispatch there — no host hook exists between steps).
    """
    viz_cfg = viz_cfg or {}
    if not viz_cfg.get("enable", False):
        return None, None, 0, 0
    every = int(viz_cfg.get("log_every_n_epochs", 1) or 1)
    every_steps = int(viz_cfg.get("log_every_n_steps", 0) or 0)
    viz = VizDiagnostics(
        viz_cfg,
        model_name=model_name,
        param_names=param_names,
        denormalize=denormalize,
        label_bounds=label_bounds,
        # Reference `callback_factory.py:28`: viz.save_local overrides the
        # train.save default; without either, artifacts go W&B-only (or are
        # skipped when no logger is attached).
        save_enabled=bool(viz_cfg.get("save_local", save_enabled)),
    )
    cka = CKAMonitor() if viz_cfg.get("compute_cka", True) else None
    return viz, cka, every, every_steps

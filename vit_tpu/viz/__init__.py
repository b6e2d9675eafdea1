"""Visualization / diagnostics: test reports, training GIFs, CKA monitor."""

from vit_tpu.viz.plotter import RegressionPlotter  # noqa: F401
from vit_tpu.viz.callback_factory import create_viz_callbacks  # noqa: F401

#!/usr/bin/env python
"""Batch-inference CLI over a trained checkpoint (vit_tpu.serve.Predictor).

Rebuild-only addition (the reference has no serving entry point): load a
config + checkpoint (orbax ``best``/``last``/path or a torch ``.pt``) and
predict denormalized parameters (regression) or classes (classification)
for spectra/images from an HDF5/npz file, writing a ``.npz`` with
predictions (and logits for cls).

Example:
  python scripts/predict.py -f configs/exp/att_clp/baseline.yaml \
      --ckpt best --input $TEST_DIR/dataset.h5 --output preds.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_inputs(path: str, limit: int | None) -> np.ndarray:
    if path.endswith(".npz"):
        with np.load(path) as z:
            for key in ("images", "x", "flux"):
                if key in z:
                    break
            else:
                raise KeyError(
                    f"{path} has no 'images'/'x'/'flux' array "
                    f"(found: {sorted(z.keys())})"
                )
            x = np.asarray(z[key])
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / 255.0
    else:
        from vit_tpu.data.hdf5 import load_spectra

        x = np.asarray(load_spectra(path, limit)["flux"], np.float32)
    if limit is not None and 0 < limit < len(x):
        x = x[:limit]
    return x


def main() -> int:
    p = argparse.ArgumentParser(description="vit_tpu batch inference")
    p.add_argument("-f", "--config", required=True, help="YAML config path")
    p.add_argument("--ckpt", default="best", help="best | last | path | torch .pt")
    p.add_argument("--input", required=True, help="HDF5 spectra or npz images")
    p.add_argument("--output", default="predictions.npz")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--proba", action="store_true",
                   help="classification: write softmax probabilities too")
    p.add_argument("--precision", default=None,
                   help="serving compute dtype override (e.g. bf16)")
    p.add_argument("--quantize", default=None,
                   choices=["int8", "int8-w8a8", "int8-wo"],
                   help="int8 encoder weights (vit_tpu.ops.quant): 'int8' "
                        "auto-routes W8A8/weight-only by batch size; the "
                        "explicit modes pin the variant")
    p.add_argument("--calibrate", action="store_true",
                   help="W8A8: derive static activation scales from the "
                        "first input batch (quant fuses into preceding ops)")
    p.add_argument("--perf-preset", action="store_true",
                   help="measured serving fast path: bf16 + tanh GELU + "
                        "bf16 softmax (1.53x over fp32 on ViT-B/16)")
    p.add_argument("-g", "--gpus", "--devices", dest="devices", type=int,
                   default=None,
                   help="data-parallel serving over N mesh devices")
    args = p.parse_args()

    from vit_tpu.serve import Predictor

    x = load_inputs(args.input, args.limit)
    pred = Predictor.from_checkpoint(args.config, ckpt=args.ckpt,
                                     batch_size=args.batch_size,
                                     precision=args.precision,
                                     quantize=args.quantize,
                                     calibration=(
                                         x[: args.batch_size]
                                         if args.calibrate else None
                                     ),
                                     perf_preset=args.perf_preset,
                                     num_devices=args.devices)
    out = {"predictions": pred.predict(x)}
    if args.proba and pred.vit_config.task_type == "cls":
        out["probabilities"] = pred.predict_proba(x)
    np.savez(args.output, **out)
    print(f"[predict] {len(x)} inputs -> {args.output} "
          f"(task={pred.vit_config.task_type}, shape={out['predictions'].shape})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

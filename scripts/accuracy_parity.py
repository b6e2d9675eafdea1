#!/usr/bin/env python
"""Accuracy-parity run: vit_tpu vs a bare-torch reference twin on the SAME
synthetic dataset (closes BASELINE.json's "at matching val accuracy" clause).

The throughput contract (`BASELINE.json:5`) is conditioned on accuracy
parity with the reference stack, so this script trains BOTH stacks to
convergence on one synthetic dataset and compares converged ``val_mae``:

* **vit_tpu**: the real `Experiment` (fused-epoch path, loss.name 'mae'
  which trains MSE — the documented reference quirk,
  `/root/reference/src/vit.py:58-63`), on CPU for a deterministic,
  contention-free run.
* **torch twin**: the reference architecture re-assembled in bare torch
  (SW tokenizer = Linear over unfolded patches, randn CLS, pre-LN blocks
  with MHA + GELU MLP + dropout 0.1, final LN, CLS head — mirroring
  `/root/reference/src/models/specvit.py` minus Lightning), trained with
  AdamW(lr, wd=0) + grad-clip 0.5 + MSE on the SAME normalized arrays the
  vit_tpu datamodule produced.

Train and val are disjoint slices of ONE synthetic draw, so they share
the same physical system (the generator draws absorption-line centers per
seed — a val file drawn with a different seed is a *different* system and
pins every model at mean-prediction, measured). The workload is sized so
both stacks genuinely learn: both must land well below the 0.25 val MAE
of mean-prediction for the comparison to mean anything (the `learned`
gate below enforces this). Both see identical data and label
normalization; RNG streams (init, shuffle, dropout) differ — the claim is
equal converged QUALITY (final-epoch val_mae for both), not an identical
trajectory. Prints one JSON line with both val_mae values and their
relative gap; exits nonzero if the gap exceeds --tol (default 10%,
generous vs the ~2-3% seed-to-seed spread of this tiny workload).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


N_TRAIN = 1024
N_VAL = 512


def _config(train_h5: str, val_h5: str, epochs: int, lr: float):
    return {
        "project": "accuracy-parity",
        "model": {
            "name": "vit", "task_type": "reg", "image_size": 1024,
            "patch_size": 32, "hidden_size": 32, "num_hidden_layers": 3,
            "num_attention_heads": 2, "stride_size": 32, "proj_fn": "SW",
        },
        "train": {"batch_size": 64, "ep": epochs, "save": False},
        "loss": {"name": "mae"},  # reference quirk: 'mae' trains MSE
        "opt": {"type": "AdamW", "lr": lr, "lr_sch": "none"},
        "data": {"file_path": train_h5, "val_path": val_h5,
                 "num_samples": N_TRAIN, "num_test_samples": N_VAL,
                 "param": "log_g", "label_norm": "minmax"},
        "noise": {"noise_level": 0},
        "viz": {"enable": False},
    }


def run_vit_tpu(cfg: dict) -> float:
    from vit_tpu.train.loop import Experiment

    metrics = Experiment(cfg, seed=0).fit()
    return float(metrics["val_mae"])


def run_torch_twin(cfg: dict, epochs: int, lr: float, seed: int = 0) -> float:
    import torch
    import torch.nn as nn

    from vit_tpu.data.datasets import dataset_from_config

    torch.manual_seed(seed)
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    train_ds = dataset_from_config(cfg)
    train_ds.load_data("train")
    val_ds = dataset_from_config(cfg)
    val_ds.set_norm_stats(train_ds.norm_stats())
    val_ds.load_data("val")
    xt = torch.from_numpy(np.asarray(train_ds.model_input, np.float32))
    yt = torch.from_numpy(np.asarray(train_ds.labels, np.float32)).reshape(-1, 1)
    xv = torch.from_numpy(np.asarray(val_ds.model_input, np.float32))
    yv = torch.from_numpy(np.asarray(val_ds.labels, np.float32)).reshape(-1, 1)

    m = cfg["model"]
    H, HEADS, LAYERS, P = (m["hidden_size"], m["num_attention_heads"],
                           m["num_hidden_layers"], m["patch_size"])

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = nn.LayerNorm(H, eps=1e-12)
            self.attn = nn.MultiheadAttention(
                H, HEADS, dropout=0.1, batch_first=True
            )
            self.ln2 = nn.LayerNorm(H, eps=1e-12)
            self.mlp = nn.Sequential(
                nn.Linear(H, 4 * H), nn.GELU(), nn.Linear(4 * H, H),
                nn.Dropout(0.1),
            )
            self.drop = nn.Dropout(0.1)

        def forward(self, x):
            h = self.ln1(x)
            x = x + self.drop(self.attn(h, h, h, need_weights=False)[0])
            return x + self.mlp(self.ln2(x))

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Linear(P, H)
            self.cls = nn.Parameter(torch.randn(1, 1, H))
            self.blocks = nn.ModuleList(Block() for _ in range(LAYERS))
            self.ln = nn.LayerNorm(H, eps=1e-12)
            self.head = nn.Linear(H, 1)

        def forward(self, x):
            tok = self.proj(x.unfold(1, P, P))
            tok = torch.cat([self.cls.expand(len(x), 1, H), tok], dim=1)
            for blk in self.blocks:
                tok = blk(tok)
            return self.head(self.ln(tok)[:, 0])

    model = Twin()
    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=0.0)
    loss_fn = nn.MSELoss()
    batch = cfg["train"]["batch_size"]
    rng = np.random.default_rng(seed)
    n = len(xt)
    val_mae = float("inf")
    for _ in range(epochs):
        model.train()
        perm = rng.permutation(n)
        for i in range(0, n - batch + 1, batch):
            idx = perm[i:i + batch]
            opt.zero_grad(set_to_none=True)
            loss = loss_fn(model(xt[idx]), yt[idx])
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 0.5)
            opt.step()
        model.eval()
        with torch.no_grad():
            val_mae = float((model(xv) - yv).abs().mean())
    return val_mae  # final epoch, matching Experiment.fit()'s return


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--tol", type=float, default=0.10,
                    help="max |vit_tpu - torch| / torch relative gap")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # deterministic, no tunnel

    from vit_tpu.data.synthetic import make_dummy_spectra, write_dummy_h5

    def _slice(d: dict, sl: slice) -> dict:
        return {"wave": d["wave"], "flux": d["flux"][sl],
                "error": d["error"][sl],
                "params": {k: v[sl] for k, v in d["params"].items()}}

    with tempfile.TemporaryDirectory() as td:
        train_h5 = os.path.join(td, "parity_train.h5")
        val_h5 = os.path.join(td, "parity_val.h5")
        full = make_dummy_spectra(n=N_TRAIN + N_VAL, length=1024, seed=0)
        write_dummy_h5(train_h5, data=_slice(full, slice(0, N_TRAIN)))
        write_dummy_h5(val_h5, data=_slice(full, slice(N_TRAIN, None)))
        cfg = _config(train_h5, val_h5, args.epochs, args.lr)
        vit_mae = run_vit_tpu(cfg)
        torch_mae = run_torch_twin(cfg, args.epochs, args.lr)

    gap = abs(vit_mae - torch_mae) / max(torch_mae, 1e-9)
    # 0.25 = mean-prediction on minmax labels; both stacks must beat it
    # decisively or the run is vacuous (undertrained) regardless of the gap.
    learned = vit_mae < 0.2 and torch_mae < 0.2
    print(json.dumps({
        "val_mae_vit_tpu": round(vit_mae, 5),
        "val_mae_torch_reference_twin": round(torch_mae, 5),
        "rel_gap": round(gap, 4),
        "tol": args.tol,
        "epochs": args.epochs,
        "learned": learned,
        "parity": learned and gap <= args.tol,
    }))
    sys.exit(0 if (learned and gap <= args.tol) else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measure the reference stack's compute core in torch (CPU) on the baseline
workload — a real datapoint anchoring BASELINE.md's A100 estimate.

The reference is PyTorch-Lightning + HF ViT (`/root/reference/src/models/
specvit.py`); Lightning is not installed in this image, so this measures a
bare-torch equivalent of the baseline model (4096-px spectrum, SW tokenizer
patch/stride 32 -> 129 tokens, hidden 32, 3 pre-LN layers, 2 heads, MLP 4x,
MSE loss, AdamW, batch 64) — i.e. the reference's per-step compute WITHOUT
Lightning dispatch overhead, which makes the resulting img/s an upper bound
on what the reference stack achieves per CPU. Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn as nn

B, L, P, H, HEADS, LAYERS = 64, 4096, 32, 32, 2, 3
T = (L - P) // P + 1 + 1  # 128 patches + CLS = 129


class Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.ln1 = nn.LayerNorm(H, eps=1e-12)
        self.attn = nn.MultiheadAttention(H, HEADS, dropout=0.1, batch_first=True)
        self.ln2 = nn.LayerNorm(H, eps=1e-12)
        self.mlp = nn.Sequential(
            nn.Linear(H, 4 * H), nn.GELU(), nn.Linear(4 * H, H), nn.Dropout(0.1)
        )

    def forward(self, x):
        h = self.ln1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        return x + self.mlp(self.ln2(x))


class TinySpecViT(nn.Module):
    def __init__(self):
        super().__init__()
        self.proj = nn.Linear(P, H)
        self.cls = nn.Parameter(torch.randn(1, 1, H))
        self.blocks = nn.ModuleList(Block() for _ in range(LAYERS))
        self.ln = nn.LayerNorm(H, eps=1e-12)
        self.head = nn.Linear(H, 1)

    def forward(self, x):
        tok = self.proj(x.unfold(1, P, P))  # (B, 128, H)
        tok = torch.cat([self.cls.expand(len(x), 1, H), tok], dim=1)
        for blk in self.blocks:
            tok = blk(tok)
        return self.head(self.ln(tok)[:, 0])


def main() -> None:
    torch.manual_seed(0)
    model = TinySpecViT()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    x = torch.randn(B, L)
    y = torch.rand(B, 1)
    loss_fn = nn.MSELoss()

    def step():
        opt.zero_grad(set_to_none=True)
        loss = loss_fn(model(x), y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 0.5)
        opt.step()
        return float(loss.detach())

    for _ in range(10):
        step()
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = (time.perf_counter() - t0) / n
    n_params = sum(p.numel() for p in model.parameters())
    print(json.dumps({
        "metric": "torch-CPU reference-equivalent train img/s (baseline workload)",
        "value": round(B / dt, 1),
        "step_ms": round(dt * 1e3, 3),
        "params": n_params,
        "threads": torch.get_num_threads(),
        "note": "bare torch, no Lightning overhead -> upper bound for the reference stack on this CPU",
    }))


if __name__ == "__main__":
    main()

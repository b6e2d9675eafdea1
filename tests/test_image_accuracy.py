"""Contract tests for the image-family accuracy harness.

`scripts/image_accuracy.py` is the converged-accuracy evidence for the
driver's image configs (BASELINE.json configs 2/3); these tests pin the
parts of its protocol that make the evidence valid — no training here.
"""

import importlib.util
import os
import sys

import numpy as np

_SPEC = importlib.util.spec_from_file_location(
    "image_accuracy",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "image_accuracy.py"),
)
ia = importlib.util.module_from_spec(_SPEC)
sys.modules["image_accuracy"] = ia
_SPEC.loader.exec_module(ia)


def test_splits_are_deterministic():
    a = ia.make_noisy_class_images(64, seed=3, amplitude=16.0)
    b = ia.make_noisy_class_images(64, seed=3, amplitude=16.0)
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["labels"], b["labels"])


def test_class_templates_shared_across_splits():
    """The class DEFINITION (template) must be identical between the train
    and val draws — otherwise converged val_acc would not measure
    generalization. Per-class sample means from two independent seeds must
    agree far beyond the noise floor."""
    n = 2000
    tr = ia.make_noisy_class_images(n, seed=0, amplitude=60.0)
    va = ia.make_noisy_class_images(n, seed=1, amplitude=60.0)

    def class_means(d):
        return np.stack([
            d["images"][d["labels"] == k].astype(np.float64).mean(0)
            for k in range(ia.NUM_CLASSES)
        ])

    mtr, mva = class_means(tr) - 128.0, class_means(va) - 128.0
    # cosine similarity of the *matching* class templates ≈ 1; of
    # mismatched classes ≈ 0 (independent random fields)
    def cos(a, b):
        return float((a * b).sum() /
                     (np.linalg.norm(a) * np.linalg.norm(b)))

    match = np.array([cos(mtr[k], mva[k]) for k in range(ia.NUM_CLASSES)])
    cross = np.array([cos(mtr[k], mva[(k + 1) % ia.NUM_CLASSES])
                      for k in range(ia.NUM_CLASSES)])
    assert match.min() > 0.9, match
    assert np.abs(cross).max() < 0.3, cross


def test_samples_differ_between_splits():
    tr = ia.make_noisy_class_images(32, seed=0, amplitude=16.0)
    va = ia.make_noisy_class_images(32, seed=1, amplitude=16.0)
    assert not np.array_equal(tr["images"], va["images"])


def test_config_pins_cosine_period_to_run_length():
    """Reference parity reads the cosine period from opt.ep/T_max (default
    100), NOT train.ep — the harness must pin T_max=epochs or a 14-epoch
    run trains almost entirely inside the warmup ramp."""
    paths = {"train": "t.npz", "val": "v.npz", "test": "s.npz"}
    cfg = ia._vit_s16_config(paths, epochs=14, lr=1e-3, batch=128,
                             n_train=2048, n_eval=1000)
    assert cfg["opt"]["T_max"] == 14
    assert cfg["model"]["task_type"] == "cls"
    assert cfg["model"]["num_labels"] == ia.NUM_CLASSES
    assert cfg["loss"]["name"] == "ce"
    assert cfg["warmup"]["ratio"] == 0.1

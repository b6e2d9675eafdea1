"""Worker for the REAL multi-process jax.distributed integration test.

Launched by ``tests/test_multihost.py::test_two_process_distributed_dp_step``
as 2 subprocesses x 4 virtual CPU devices each. Goes through the production
DCN init path (``maybe_initialize_distributed`` reads
``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``),
builds the GLOBAL 8-device mesh, runs ONE data-parallel train step on the
flagship model, and prints the replicated loss as JSON — the parent asserts
both processes agree with the single-process value.
"""

import json
import os
import sys

# 4 local virtual CPU devices per process (the parent exports the env, but
# normalize here so a stale 8 from the test conftest can't leak through).
import re

_flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+", "",
    os.environ.get("XLA_FLAGS", ""),
)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var

import numpy as np  # noqa: E402

from vit_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    make_mesh,
    maybe_initialize_distributed,
    replicated_sharding,
)


def main() -> None:
    maybe_initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8  # the global mesh spans both processes

    import jax.numpy as jnp

    from vit_tpu.models.builder import get_model
    from vit_tpu.train.loop import TrainState, make_train_step
    from vit_tpu.train.optim import OptSpec, build_optimizer

    cfg = {
        "project": "multiproc-test",
        "model": {
            "name": "vit", "task_type": "reg", "image_size": 512,
            "patch_size": 32, "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 2, "stride_size": 32, "proj_fn": "SW",
            "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
        },
        "train": {"batch_size": 16, "ep": 1},
        "loss": {"name": "mae"},
        "data": {"param": "log_g"},
        "noise": {"noise_level": 0},
    }
    bundle = get_model(cfg)
    mesh = make_mesh()  # all 8 global devices
    repl = replicated_sharding(mesh)
    bshard = batch_sharding(mesh)

    # Identical on every process: same seed -> same init, same batch.
    params = bundle.module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512))
    )["params"]
    rng = np.random.default_rng(0)
    x_host = np.asarray(rng.standard_normal((16, 512)), np.float32)
    y_host = np.asarray(rng.random((16, 1)), np.float32)

    def put_global(host, sharding):
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )

    batch = {
        "x": put_global(x_host, bshard),
        "label": put_global(y_host, bshard),
    }
    spec = OptSpec(lr=1e-3, opt_type="adamw", steps_per_epoch=1, total_epochs=1)
    tx = build_optimizer(spec)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=jax.random.PRNGKey(1),
        plateau_scale=jnp.ones((), jnp.float32),
        frozen=jnp.zeros((), jnp.float32),
    )
    state = jax.device_put(state, repl)
    train_step = make_train_step(bundle, tx, spec, 0.0, repl, bshard)
    state, metrics = train_step(state, batch)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    # a param checksum proves the UPDATE (incl. the cross-process grad
    # all-reduce) agrees too, not just the loss
    psum = float(
        sum(float(np.abs(np.asarray(jax.device_get(p))).sum())
            for p in jax.tree_util.tree_leaves(state.params))
    )
    print(json.dumps({
        "process": int(os.environ.get("JAX_PROCESS_ID", -1)),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "loss": loss,
        "param_checksum": psum,
    }))


if __name__ == "__main__":
    main()
    sys.exit(0)

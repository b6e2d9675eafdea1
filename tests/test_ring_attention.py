"""Ring attention (sequence-parallel) on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.ops.flash_attention import _xla_attention
from vit_tpu.ops.ring_attention import ring_attention
from vit_tpu.parallel.mesh import make_mesh


def _ref(q, k, v):
    b, h, t, d = q.shape
    return _xla_attention(
        q.reshape(b * h, t, d), k.reshape(b * h, t, d), v.reshape(b * h, t, d),
        d**-0.5,
    ).reshape(b, h, t, d)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(num_devices=8)


@pytest.mark.parametrize("shape", [(2, 2, 256, 16), (1, 4, 512, 32)])
def test_ring_matches_single_device(shape, mesh8):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3))
    out = ring_attention(q, k, v, mesh=mesh8, axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v)), atol=2e-5)


def test_ring_output_sharded_over_sequence(mesh8):
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 256, 16)), jnp.float32)
               for _ in range(3))
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=mesh8))(q, k, v)
    assert "data" in str(out.sharding.spec)


def test_ring_gradients_match_reference(mesh8):
    rng = np.random.default_rng(2)
    shape = (1, 2, 128, 16)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3))

    g1 = jax.grad(lambda q, k, v: (ring_attention(q, k, v, mesh=mesh8) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: (_ref(q, k, v) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 1e-4, rel


def test_ring_rejects_indivisible_length(mesh8):
    q = jnp.zeros((1, 2, 130, 16))
    with pytest.raises(ValueError, match="divisible"):
        ring_attention(q, q, q, mesh=mesh8)

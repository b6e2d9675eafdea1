"""Topology-aware device placement (vit_tpu/parallel/mesh.py::device_grid).

On real TPU deployments the mesh's trailing axes (model/pipe) carry the
chatty collectives, so their device groups must ride ICI: within one
slice, contiguous on the torus. Only the data axis's gradient all-reduce
may cross DCN. The reference has no analogue (its 'ddp' strategy is
single-host NCCL, `/root/reference/src/hardware_utils.py:86-95`); this is
the scaling-book placement recipe, tested here with fake TPU device
objects (2 slices x 2x2 torus).
"""

import numpy as np

import jax

from vit_tpu.parallel.mesh import device_grid, make_mesh


class FakeTpuDevice:
    """Duck-typed TPU device: what mesh_utils actually reads."""

    def __init__(self, i: int, slice_index: int):
        self.id = i
        self.slice_index = slice_index
        self.process_index = slice_index
        self.platform = "tpu"
        self.device_kind = "fake-tpu"
        j = i % 4
        self.coords = (j % 2, j // 2, 0)  # 2x2x1 torus per slice
        self.core_on_chip = 0
        self.client = None

    def __repr__(self):
        return f"FakeTpu(id={self.id}, slice={self.slice_index})"


def _fakes(n=8, per_slice=4):
    return [FakeTpuDevice(i, i // per_slice) for i in range(n)]


def test_multislice_model_groups_stay_on_ici():
    """(data=4, model=2) over 2 slices: every model pair in ONE slice."""
    grid = device_grid(_fakes(), (4, 2))
    assert grid.shape == (4, 2)
    for row in grid:
        assert len({d.slice_index for d in row}) == 1, row
    # the data axis crosses DCN: both slices appear along it
    assert {d.slice_index for d in grid[:, 0]} == {0, 1}
    # all 8 devices placed exactly once
    assert sorted(d.id for d in grid.ravel()) == list(range(8))


def test_multislice_pipe_axis_stays_on_ici():
    """(data=2, model=2, pipe=2): trailing 2x2 block within one slice."""
    grid = device_grid(_fakes(), (2, 2, 2))
    assert grid.shape == (2, 2, 2)
    for i in range(2):
        assert len({d.slice_index for d in grid[i].ravel()}) == 1
    assert sorted(d.id for d in grid.ravel()) == list(range(8))


def test_indivisible_data_axis_falls_back(capsys):
    """data=3 over 2 slices cannot keep model pairs on ICI: visible
    enumeration fallback instead of a silently DCN-crossing model axis."""
    devs = [FakeTpuDevice(i, i // 3) for i in range(6)]
    grid = device_grid(devs, (3, 2))
    out = capsys.readouterr().out
    assert "topology-aware placement unavailable" in out
    assert grid.shape == (3, 2)
    assert [d.id for d in grid.ravel()] == list(range(6))


def test_missing_coords_falls_back(capsys):
    """TPU-flavored devices without torus coords: enumeration order."""
    devs = _fakes()
    for d in devs:
        del d.coords
    grid = device_grid(devs, (4, 2))
    assert "topology-aware placement unavailable" in capsys.readouterr().out
    assert [d.id for d in grid.ravel()] == list(range(8))


def test_cpu_devices_keep_enumeration_order():
    """CPU/virtual meshes stay in enumeration order (test determinism)."""
    devs = jax.devices()[:8]
    grid = device_grid(devs, (4, 2))
    assert [d.id for d in grid.ravel()] == [d.id for d in devs]


def test_make_mesh_unchanged_on_cpu():
    mesh = make_mesh(num_devices=8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    assert [d.id for d in np.asarray(mesh.devices).ravel()] == [
        d.id for d in jax.devices()[:8]
    ]

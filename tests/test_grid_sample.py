"""Parity tests for VM factor-grid sampling against torch.nn.functional.grid_sample
(align_corners=True, padding_mode='zeros') — the exact op the reference uses."""
import numpy as np
import pytest

import jax.numpy as jnp

from contrastive_lift_tpu.ops.grid_sample import (line_sample, plane_sample,
                                                  upsample_line, upsample_plane,
                                                  vm_density, vm_feature)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_plane_sample(plane, xy):
    """Oracle: grid_sample on [1,C,H,W] at [1,P,1,2] coords."""
    p = torch.from_numpy(plane)[None]
    g = torch.from_numpy(xy)[None, :, None, :]
    out = F.grid_sample(p, g, align_corners=True)  # [1,C,P,1]
    return out[0, :, :, 0].T.numpy()  # [P, C]


def torch_line_sample(line, z):
    """Oracle: grid_sample on [1,C,L,1] at coords (0, z) like the reference."""
    l = torch.from_numpy(line)[None, :, :, None]
    coords = np.stack([np.zeros_like(z), z], -1)
    g = torch.from_numpy(coords)[None, :, None, :]
    out = F.grid_sample(l, g, align_corners=True)
    return out[0, :, :, 0].T.numpy()


def test_plane_sample_matches_torch():
    rng = np.random.default_rng(0)
    plane = rng.normal(size=(16, 9, 13)).astype(np.float32)
    xy = rng.uniform(-1, 1, size=(257, 2)).astype(np.float32)
    ours = np.asarray(plane_sample(jnp.asarray(plane), jnp.asarray(xy)))
    ref = torch_plane_sample(plane, xy)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_plane_sample_out_of_range_zero_padded():
    rng = np.random.default_rng(1)
    plane = rng.normal(size=(4, 8, 8)).astype(np.float32)
    xy = np.array([[-1.5, 0.0], [0.0, 1.4], [2.0, 2.0], [0.3, -0.2]], np.float32)
    ours = np.asarray(plane_sample(jnp.asarray(plane), jnp.asarray(xy)))
    ref = torch_plane_sample(plane, xy)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_line_sample_matches_torch():
    rng = np.random.default_rng(2)
    line = rng.normal(size=(16, 11)).astype(np.float32)
    z = rng.uniform(-1, 1, size=(100,)).astype(np.float32)
    ours = np.asarray(line_sample(jnp.asarray(line), jnp.asarray(z)))
    ref = torch_line_sample(line, z)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _torch_vm_density(planes, lines, xyz):
    """Torch oracle reproducing the reference density math (tensoRF.py:114-122)."""
    matrix_mode = [[0, 1], [0, 2], [1, 2]]
    vector_mode = [2, 1, 0]
    total = np.zeros(xyz.shape[0], np.float32)
    for i in range(3):
        m0, m1 = matrix_mode[i]
        v = vector_mode[i]
        p = torch_plane_sample(planes[i], xyz[:, [m0, m1]])
        l = torch_line_sample(lines[i], xyz[:, v])
        total += (p * l).sum(-1)
    return total


def test_vm_density_matches_torch_oracle():
    rng = np.random.default_rng(3)
    gdim = (12, 10, 14)
    matrix_mode = [[0, 1], [0, 2], [1, 2]]
    vector_mode = [2, 1, 0]
    planes = [rng.normal(size=(16, gdim[m1], gdim[m0])).astype(np.float32)
              for m0, m1 in matrix_mode]
    lines = [rng.normal(size=(16, gdim[v])).astype(np.float32) for v in vector_mode]
    xyz = rng.uniform(-1, 1, size=(333, 3)).astype(np.float32)
    ours = np.asarray(vm_density(tuple(map(jnp.asarray, planes)),
                                 tuple(map(jnp.asarray, lines)), jnp.asarray(xyz)))
    ref = _torch_vm_density(planes, lines, xyz)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_vm_feature_shape_and_concat_order():
    rng = np.random.default_rng(4)
    gdim = (8, 8, 8)
    matrix_mode = [[0, 1], [0, 2], [1, 2]]
    vector_mode = [2, 1, 0]
    comps = (4, 5, 6)
    planes = [rng.normal(size=(comps[i], gdim[matrix_mode[i][1]], gdim[matrix_mode[i][0]])).astype(np.float32)
              for i in range(3)]
    lines = [rng.normal(size=(comps[i], gdim[vector_mode[i]])).astype(np.float32)
             for i in range(3)]
    xyz = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    feat = np.asarray(vm_feature(tuple(map(jnp.asarray, planes)),
                                 tuple(map(jnp.asarray, lines)), jnp.asarray(xyz)))
    assert feat.shape == (50, sum(comps))
    # first block must equal axis-0 plane*line product
    p0 = torch_plane_sample(planes[0], xyz[:, [0, 1]])
    l0 = torch_line_sample(lines[0], xyz[:, 2])
    np.testing.assert_allclose(feat[:, :4], p0 * l0, atol=1e-4)


def test_upsample_matches_torch_interpolate():
    rng = np.random.default_rng(5)
    plane = rng.normal(size=(6, 9, 7)).astype(np.float32)
    ours = np.asarray(upsample_plane(jnp.asarray(plane), (17, 13)))
    ref = F.interpolate(torch.from_numpy(plane)[None], size=(17, 13),
                        mode="bilinear", align_corners=True)[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    line = rng.normal(size=(6, 9)).astype(np.float32)
    ours_l = np.asarray(upsample_line(jnp.asarray(line), 21))
    ref_l = F.interpolate(torch.from_numpy(line)[None, :, :, None], size=(21, 1),
                          mode="bilinear", align_corners=True)[0, :, :, 0].numpy()
    np.testing.assert_allclose(ours_l, ref_l, atol=1e-5)

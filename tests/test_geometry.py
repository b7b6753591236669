"""Golden tests: geometry ops vs the reference math re-implemented in torch.

Each test rebuilds the reference's torch computation locally (from
movedepth/layers.py) and checks our JAX op against it numerically.
"""

import numpy as np
import torch
import jax.numpy as jnp

from movedepth_tpu.ops import geometry as G


def torch_rot_from_axisangle(vec):
    """reference: movedepth/layers.py:479-518 (inputs B x 1 x 3)."""
    angle = torch.norm(vec, 2, 2, True)
    axis = vec / (angle + 1e-7)
    ca = torch.cos(angle)
    sa = torch.sin(angle)
    C = 1 - ca
    x = axis[..., 0].unsqueeze(1)
    y = axis[..., 1].unsqueeze(1)
    z = axis[..., 2].unsqueeze(1)
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    rot = torch.zeros((vec.shape[0], 4, 4))
    rot[:, 0, 0] = torch.squeeze(x * xC + ca)
    rot[:, 0, 1] = torch.squeeze(xyC - zs)
    rot[:, 0, 2] = torch.squeeze(zxC + ys)
    rot[:, 1, 0] = torch.squeeze(xyC + zs)
    rot[:, 1, 1] = torch.squeeze(y * yC + ca)
    rot[:, 1, 2] = torch.squeeze(yzC - xs)
    rot[:, 2, 0] = torch.squeeze(zxC - ys)
    rot[:, 2, 1] = torch.squeeze(yzC + xs)
    rot[:, 2, 2] = torch.squeeze(z * zC + ca)
    rot[:, 3, 3] = 1
    return rot


def torch_transformation(axisangle, translation, invert=False):
    """reference: movedepth/layers.py:412-429,464-477."""
    R = torch_rot_from_axisangle(axisangle)
    t = translation.clone()
    if invert:
        R = R.transpose(1, 2)
        t *= -1
    T = torch.zeros(t.shape[0], 4, 4)
    tt = t.contiguous().view(-1, 3, 1)
    T[:, 0, 0] = T[:, 1, 1] = T[:, 2, 2] = T[:, 3, 3] = 1
    T[:, :3, 3, None] = tt
    return torch.matmul(R, T) if invert else torch.matmul(T, R)


def test_disp_to_depth():
    disp = np.random.default_rng(0).uniform(0, 1, (2, 8, 8)).astype(np.float32)
    sd, d = G.disp_to_depth(jnp.asarray(disp), 0.1, 100.0)
    sd_ref = 1 / 100.0 + (1 / 0.1 - 1 / 100.0) * disp
    np.testing.assert_allclose(np.asarray(sd), sd_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d), 1 / sd_ref, rtol=1e-5)


def test_rot_from_axisangle_matches_torch(rng):
    vec = rng.normal(0, 0.3, (4, 1, 3)).astype(np.float32)
    ours = np.asarray(G.rot_from_axisangle(jnp.asarray(vec[:, 0])))
    ref = torch_rot_from_axisangle(torch.from_numpy(vec)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_transformation_from_parameters_matches_torch(rng):
    aa = rng.normal(0, 0.1, (4, 1, 3)).astype(np.float32)
    tr = rng.normal(0, 0.5, (4, 1, 3)).astype(np.float32)
    for invert in (False, True):
        ours = np.asarray(
            G.transformation_from_parameters(
                jnp.asarray(aa[:, 0]), jnp.asarray(tr[:, 0]), invert=invert
            )
        )
        ref = torch_transformation(
            torch.from_numpy(aa), torch.from_numpy(tr[:, 0]), invert
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_backproject_project_roundtrip(rng):
    """Identity transform must project back onto the pixel grid."""
    b, h, w = 2, 6, 10
    K = np.array(
        [[0.58 * w, 0, 0.5 * w, 0], [0, 1.92 * h, 0.5 * h, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )
    K = np.tile(K, (b, 1, 1))
    inv_K = np.linalg.pinv(K)
    depth = rng.uniform(1, 50, (b, h, w)).astype(np.float32)
    pts = G.backproject(jnp.asarray(depth), jnp.asarray(inv_K))
    assert pts.shape == (b, 4, h * w)
    T = jnp.tile(jnp.eye(4), (b, 1, 1))
    grid = G.project(pts, jnp.asarray(K), T, h, w)
    assert grid.shape == (b, h, w, 2)
    # reconstruct expected normalized coords of the identity warp
    xs = (np.arange(w) / (w - 1) - 0.5) * 2
    ys = (np.arange(h) / (h - 1) - 0.5) * 2
    np.testing.assert_allclose(np.asarray(grid[..., 0]),
                               np.broadcast_to(xs, (b, h, w)), atol=2e-4)
    np.testing.assert_allclose(np.asarray(grid[..., 1]),
                               np.broadcast_to(ys[:, None], (b, h, w)),
                               atol=2e-4)


def test_backproject_matches_reference_math(rng):
    """points = depth * K^-1 pix, vs a dense numpy computation."""
    b, h, w = 1, 4, 5
    K3 = np.array([[20.0, 0, 2.5], [0, 18.0, 2.0], [0, 0, 1]], np.float32)
    inv_K = np.eye(4, dtype=np.float32)
    inv_K[:3, :3] = np.linalg.inv(K3)
    depth = rng.uniform(1, 10, (b, h, w)).astype(np.float32)
    pts = np.asarray(G.backproject(jnp.asarray(depth), jnp.asarray(inv_K[None])))
    xg, yg = np.meshgrid(np.arange(w), np.arange(h))
    pix = np.stack([xg.ravel(), yg.ravel(), np.ones(h * w)], 0).astype(np.float32)
    expected = depth.reshape(b, 1, -1) * (np.linalg.inv(K3) @ pix)[None]
    np.testing.assert_allclose(pts[:, :3], expected, rtol=1e-5)
    np.testing.assert_allclose(pts[:, 3], np.ones((b, h * w)), atol=0)


def test_project_pixel_matches_project(rng):
    """project_pixel == grid_to_pixel(project(...)) (no normalize round
    trip; used by the planar photometric path)."""
    import jax.numpy as jnp
    from movedepth_tpu.ops.geometry import project, project_pixel
    from movedepth_tpu.ops.pallas.sweep_warp import grid_to_pixel

    b, h, w = 2, 6, 8
    pts = rng.normal(0, 1, (b, 4, h * w)).astype(np.float32)
    pts[:, 2] += 4.0  # in front of the camera
    pts[:, 3] = 1.0
    K = np.eye(4, dtype=np.float32)[None].repeat(b, 0)
    K[:, 0, 0], K[:, 1, 1] = 50.0, 40.0
    K[:, 0, 2], K[:, 1, 2] = w / 2, h / 2
    T = np.eye(4, dtype=np.float32)[None].repeat(b, 0)
    T[:, 0, 3] = 0.3
    grid = project(jnp.asarray(pts), jnp.asarray(K), jnp.asarray(T), h, w)
    sx_ref, sy_ref = grid_to_pixel(grid, h, w)
    sx, sy = project_pixel(jnp.asarray(pts), jnp.asarray(K),
                           jnp.asarray(T), h, w)
    np.testing.assert_allclose(np.asarray(sx), np.asarray(sx_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sy), np.asarray(sy_ref),
                               rtol=1e-5, atol=1e-4)

"""Golden tests: SSIM / smoothness / smooth-L1 / entropy vs torch."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from movedepth_tpu.ops import losses as L


def torch_ssim(x, y):
    """reference: movedepth/layers.py:646-677."""
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def torch_smooth_loss(disp, img):
    """reference: movedepth/layers.py:630-643."""
    gdx = torch.abs(disp[:, :, :, :-1] - disp[:, :, :, 1:])
    gdy = torch.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    gix = torch.mean(torch.abs(img[:, :, :, :-1] - img[:, :, :, 1:]), 1, keepdim=True)
    giy = torch.mean(torch.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), 1, keepdim=True)
    gdx = gdx * torch.exp(-gix)
    gdy = gdy * torch.exp(-giy)
    return gdx.mean() + gdy.mean()


def test_ssim_matches_torch(rng):
    x = rng.uniform(0, 1, (2, 3, 10, 14)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 3, 10, 14)).astype(np.float32)
    ref = torch_ssim(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    ours = np.asarray(
        L.ssim(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_reprojection_loss_composition(rng):
    x = rng.uniform(0, 1, (1, 3, 8, 8)).astype(np.float32)
    y = rng.uniform(0, 1, (1, 3, 8, 8)).astype(np.float32)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    ys = jnp.asarray(y.transpose(0, 2, 3, 1))
    out = np.asarray(L.reprojection_loss(xs, ys, ssim_lw=0.85))
    ssim_ref = torch_ssim(torch.from_numpy(x), torch.from_numpy(y)).mean(1, True).numpy()
    l1_ref = torch.abs(torch.from_numpy(y - x)).mean(1, True).numpy()
    expected = 0.85 * ssim_ref + 0.15 * l1_ref
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), expected, atol=1e-5)
    # ssim_lw=0 is the pure-L1 fuse config (reference trainer.py:588)
    out0 = np.asarray(L.reprojection_loss(xs, ys, ssim_lw=0.0))
    np.testing.assert_allclose(out0.transpose(0, 3, 1, 2), l1_ref, atol=1e-6)


def test_smooth_loss_matches_torch(rng):
    disp = rng.uniform(0, 1, (2, 1, 9, 11)).astype(np.float32)
    img = rng.uniform(0, 1, (2, 3, 9, 11)).astype(np.float32)
    ref = torch_smooth_loss(torch.from_numpy(disp), torch.from_numpy(img)).item()
    ours = float(
        L.smooth_loss(jnp.asarray(disp.transpose(0, 2, 3, 1)),
                      jnp.asarray(img.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_smooth_l1_matches_torch(rng):
    a = rng.normal(0, 2, (64,)).astype(np.float32)
    b = rng.normal(0, 2, (64,)).astype(np.float32)
    ref = F.smooth_l1_loss(torch.from_numpy(a), torch.from_numpy(b)).item()
    ours = float(L.smooth_l1_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_entropy_matches_torch(rng):
    logits = rng.normal(0, 1, (2, 16, 6, 8)).astype(np.float32)
    p = torch.softmax(torch.from_numpy(logits), 1)
    ref = torch.sum(-p * p.clamp(1e-9, 1.0).log(), dim=1, keepdim=True).numpy()
    pj = jnp.asarray(p.numpy())
    ours = np.asarray(L.entropy(pj, axis=1, keepdims=True))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_automask_semantics(rng):
    """mask keeps pixels where reprojection beats identity (argmin==0)."""
    r = rng.uniform(0, 1, (1, 4, 4, 2)).astype(np.float32)
    i = rng.uniform(0, 1, (1, 4, 4, 2)).astype(np.float32)
    noise = np.zeros((1, 4, 4, 1), np.float32)
    reproj, mask = L.min_reprojection_with_automask(
        jnp.asarray(r), jnp.asarray(i), jnp.asarray(noise)
    )
    rmin = r.min(-1, keepdims=True)
    imin = i.min(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(reproj), rmin, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(mask), (rmin <= imin).astype(np.float32))


def test_folded_ssim_matches_nhwc(rng):
    """ssim_folded on the folded-planar layout == ssim on NHWC, and the
    zero pad channel contributes exact-zero dissimilarity."""
    from movedepth_tpu.ops.layout import fold_image, unfold_image

    x = rng.uniform(0, 1, (2, 10, 14, 3)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 10, 14, 3)).astype(np.float32)
    ref = np.asarray(L.ssim(jnp.asarray(x), jnp.asarray(y)))
    folded = L.ssim_folded(fold_image(jnp.asarray(x), 4),
                           fold_image(jnp.asarray(y), 4), cp=4)
    full = np.asarray(unfold_image(folded, 4, 4))
    np.testing.assert_allclose(full[..., :3], ref, atol=1e-6)
    np.testing.assert_array_equal(full[..., 3], 0.0)


def test_folded_reprojection_matches_nhwc(rng):
    from movedepth_tpu.ops.layout import fold_image

    p = rng.uniform(0, 1, (2, 10, 14, 3)).astype(np.float32)
    t = rng.uniform(0, 1, (2, 10, 14, 3)).astype(np.float32)
    ref = np.asarray(L.reprojection_loss(jnp.asarray(p), jnp.asarray(t)))
    rp, l1 = L.reprojection_loss_folded(fold_image(jnp.asarray(p), 4),
                                        fold_image(jnp.asarray(t), 4))
    np.testing.assert_allclose(np.asarray(rp), ref[..., 0], atol=1e-6)
    ref_l1 = np.abs(p - t).mean(-1)
    np.testing.assert_allclose(np.asarray(l1), ref_l1, atol=1e-6)


def test_smooth_loss_planar_matches_nhwc(rng):
    from movedepth_tpu.ops.layout import fold_image

    disp = rng.uniform(0.1, 1, (2, 10, 14, 1)).astype(np.float32)
    img = rng.uniform(0, 1, (2, 10, 14, 3)).astype(np.float32)
    ref = float(L.smooth_loss(jnp.asarray(disp), jnp.asarray(img)))
    ours = float(L.smooth_loss_planar(jnp.asarray(disp[..., 0]),
                                      fold_image(jnp.asarray(img), 4)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_automask_planar_matches_nhwc(rng):
    r = rng.uniform(0, 1, (1, 2, 4, 4)).astype(np.float32)  # (B, F, H, W)
    i = rng.uniform(0, 1, (1, 2, 4, 4)).astype(np.float32)
    noise = rng.normal(0, 1, (1, 4, 4)).astype(np.float32)
    rp_p, m_p = L.min_reprojection_with_automask_planar(
        jnp.asarray(r), jnp.asarray(i), jnp.asarray(noise))
    rp_n, m_n = L.min_reprojection_with_automask(
        jnp.asarray(r.transpose(0, 2, 3, 1)),
        jnp.asarray(i.transpose(0, 2, 3, 1)),
        jnp.asarray(noise[..., None]))
    np.testing.assert_allclose(np.asarray(rp_p), np.asarray(rp_n)[..., 0],
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_n)[..., 0])

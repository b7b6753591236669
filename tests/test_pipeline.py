"""End-to-end pipeline tests: inference forward shapes, train step runs,
loss decreases, gradient isolation (detach semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from movedepth_tpu.config import Config
from movedepth_tpu.models import build_models
from movedepth_tpu.data.synthetic import make_batch
from movedepth_tpu import pipeline as P
from movedepth_tpu.train import state as S

CFG = Config(height=64, width=96, batch_size=2, compute_dtype="float32")


@pytest.fixture(scope="module")
def setup():
    models = build_models(CFG)
    variables = S.init_variables(models, CFG, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch(CFG, 2))
    return models, variables, batch


def test_forward_infer_shapes(setup):
    models, variables, batch = setup
    out = P.forward_infer(models, variables, batch, CFG)
    assert out["disp_mono"].shape == (2, 64, 96)
    assert out["depth_mvs"].shape == (2, 64, 96)  # convex-up to full res
    assert out["cost_prob"].shape == (2, 16, 16, 24)
    d = np.asarray(out["depth_mvs"])
    assert np.isfinite(d).all() and (d > 0).all()


def test_forward_mono_infer(setup):
    models, variables, batch = setup
    out = P.forward_mono_infer(models, variables, batch, CFG)
    assert out["depth_mono"].shape == (2, 64, 96)
    v = np.asarray(out["depth_mono"])
    assert (v >= CFG.min_depth - 1e-3).all() and (v <= CFG.max_depth + 1e-3).all()


def test_forward_train_losses(setup):
    models, variables, batch = setup
    total, (losses, outputs, updates) = P.forward_train(
        models, variables, batch, CFG, jax.random.PRNGKey(1),
        use_z_bins=jnp.asarray(False))
    assert np.isfinite(float(total))
    for k in ("mono_loss", "mvs_loss", "fuse_reproj_loss", "masked_loss",
              "loss"):
        assert k in losses and np.isfinite(float(losses[k])), k
    # BN stats updated for every BN-bearing model
    assert set(updates) >= {"mono_encoder", "mvs_encoder", "reg3d",
                            "mask_cnn", "pose_encoder"}
    assert outputs["depth_mvs"].shape == (2, 64, 96)


def test_use_z_bins_changes_result(setup):
    models, variables, batch = setup
    _, (l0, _, _) = P.forward_train(models, variables, batch, CFG,
                                    jax.random.PRNGKey(1),
                                    use_z_bins=jnp.asarray(False))
    _, (l1, _, _) = P.forward_train(models, variables, batch, CFG,
                                    jax.random.PRNGKey(1),
                                    use_z_bins=jnp.asarray(True))
    assert float(l0["mvs_loss"]) != float(l1["mvs_loss"])


@pytest.mark.slow
def test_train_step_decreases_loss(setup):
    models, _, batch = setup
    state, tx = S.create_train_state(models, CFG, jax.random.PRNGKey(0),
                                     steps_per_epoch=10)
    step = S.make_train_step(models, CFG, tx)
    rngs = jax.random.split(jax.random.PRNGKey(42), 6)
    first = last = None
    for i in range(6):
        state, losses, _ = step(state, batch, rngs[i],
                                jnp.asarray(False))
        v = float(losses["loss"])
        assert np.isfinite(v)
        if first is None:
            first = v
        last = v
    assert int(state.step) == 6
    assert last < first  # same batch, loss must go down


@pytest.mark.slow
def test_fuse_loss_only_updates_mask_cnn(setup):
    """The fusion loss must not backprop into the depth branches
    (reference detaches both depths, trainer.py:413)."""
    models, variables, batch = setup
    params, stats = S.split_variables(variables)

    def fuse_only(p):
        v = S.combine_variables(p, stats)
        _, (losses, _, _) = P.forward_train(models, v, batch, CFG,
                                            jax.random.PRNGKey(1),
                                            jnp.asarray(False))
        return losses["fuse_reproj_loss"]

    grads = jax.grad(fuse_only)(params)
    g_mask = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["mask_cnn"], 0.0)
    g_mono = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["mono_depth"], 0.0)
    assert g_mask > 0.0
    assert g_mono == 0.0


def test_lr_schedule_steps():
    cfg = Config(num_epochs=20, scheduler_step_size=15, learning_rate=2e-4)
    sched = S.lr_schedule(cfg, steps_per_epoch=100, base_lr=2e-4)
    assert float(sched(0)) == pytest.approx(2e-4)
    assert float(sched(1499)) == pytest.approx(2e-4)
    assert float(sched(1500)) == pytest.approx(2e-5)


def test_multi_warp_chunked_matches_direct(rng):
    """The >8-batch chunked gather path must equal the direct path."""
    import numpy as np
    from movedepth_tpu.pipeline import _multi_warp
    from movedepth_tpu.ops.sampling import grid_sample

    b, k, h, w = 9, 3, 16, 24  # 9 -> chunks of 3
    src = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.1, 1.1, (b, k, h, w, 2)).astype(np.float32))
    out = _multi_warp(src, grid)
    assert out.shape == (b, k, h, w, 3)
    want = jax.vmap(
        lambda im, g: grid_sample(
            jnp.broadcast_to(im, (k,) + im.shape), g, "border", True)
    )(src, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


@pytest.mark.slow
def test_forward_infer_bf16_config():
    """The default (bfloat16 compute) config must produce finite depths
    (the TPU production path; runs here on CPU for regression safety)."""
    cfg = Config(height=64, width=96, batch_size=1, num_depth_bins=8)
    assert cfg.compute_dtype == "bfloat16"
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 1))
    out = P.forward_infer(models, variables, batch, cfg)
    d = np.asarray(out["depth_mvs"], dtype=np.float32)
    assert np.isfinite(d).all() and (d > 0).all()


def test_mask_mvs_conf_matches_torch_trilinear(rng):
    """conf mask ordering: trilinear-upsample the prob volume THEN max over
    depth (reference: trainer.py:420-421) -- max and interpolation don't
    commute, so this is a golden test vs torch on a random volume."""
    import torch
    import torch.nn.functional as F

    b, d, h4, w4 = 2, 8, 16, 24
    h, w = 4 * h4, 4 * w4
    prob = rng.uniform(0, 1, (b, d, h4, w4)).astype(np.float32)

    cfg = Config(height=h, width=w, batch_size=b, compute_dtype="float32",
                 mask_mvs_conf=True, photo_conf=0.5)
    batch = {"color": jnp.zeros((b, 3, h, w, 3))}
    mask = P.compute_mvs_masks(jnp.asarray(prob), None, batch, None, None,
                               cfg)

    up = F.interpolate(torch.from_numpy(prob).unsqueeze(1), [d, h, w],
                       mode="trilinear", align_corners=True)
    want = (up.max(2)[0] > cfg.photo_conf).float()[:, 0]  # (B, H, W)
    np.testing.assert_allclose(np.asarray(mask[..., 0]), want.numpy(),
                               atol=1e-6)


@pytest.mark.slow
def test_heavy_remat_path_matches_light():
    """The batch-gated rematerialization (cfg.remat_batch_threshold) must
    not change the training math: loss and parameter gradients computed
    with the heavy (jax.checkpoint) trace must match the plain trace.

    Automasking is disabled here: its mask is a discrete comparison
    between near-tied reprojection values, so the ~1e-7 float
    reassociation that different XLA fusion boundaries legitimately
    introduce flips mask bits on synthetic data. Gradients are compared
    by relative L2 per model (elementwise comparison would likewise trip
    on min-over-frames subgradient routing at tied pixels)."""
    cfg = CFG.replace(disable_automasking=True)
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 2))

    def loss_fn(variables, c):
        total, _ = P.forward_train(models, variables, batch, c,
                                   jax.random.PRNGKey(3),
                                   use_z_bins=jnp.asarray(True))
        return total

    l0, g0 = jax.value_and_grad(loss_fn)(variables, cfg)
    for scope in ("full", "mvs"):
        heavy_cfg = cfg.replace(remat_batch_threshold=0,  # batch 2 > 0
                                remat_scope=scope)
        l1, g1 = jax.value_and_grad(loss_fn)(variables, heavy_cfg)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
        assert (jax.tree_util.tree_structure(g0)
                == jax.tree_util.tree_structure(g1))
        for name in g0:
            n0 = np.sqrt(sum(float(jnp.sum(x.astype(jnp.float32) ** 2))
                             for x in jax.tree_util.tree_leaves(g0[name])))
            nd = np.sqrt(sum(
                float(jnp.sum((a.astype(jnp.float32)
                               - b.astype(jnp.float32)) ** 2))
                for a, b in zip(jax.tree_util.tree_leaves(g0[name]),
                                jax.tree_util.tree_leaves(g1[name]))))
            # tolerance: subgradient tie-flips at min-over-frames pixels
            # give O(1e-3) relative differences on synthetic data; a
            # structurally wrong remat (dropped path, doubled
            # contribution) gives O(1)
            assert nd <= 3e-2 * max(n0, 1e-8), (scope, name, nd, n0)


@pytest.mark.slow
def test_photometric_losses_planar_parity():
    """The folded-planar loss path (cfg.planar_losses) must reproduce the
    NHWC formulation: same loss values and same parameter gradients.
    Automasking stays ON here -- the two paths draw identical noise and
    compute identical values up to float reassociation, so mask bits only
    flip at exact ties (measure-zero on random data)."""
    models = build_models(CFG)
    variables = S.init_variables(models, CFG, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch(CFG, 2))

    def loss_fn(variables, c):
        total, (losses, _, _) = P.forward_train(
            models, variables, batch, c, jax.random.PRNGKey(3),
            use_z_bins=jnp.asarray(False))
        return total, losses

    (l0, d0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
        variables, CFG.replace(planar_losses=False))
    (l1, d1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        variables, CFG.replace(planar_losses=True))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    assert set(d0) == set(d1)
    for k in d0:
        np.testing.assert_allclose(float(d0[k]), float(d1[k]), rtol=2e-4,
                                   atol=1e-7, err_msg=k)
    for name in g0:
        n0 = np.sqrt(sum(float(jnp.sum(x.astype(jnp.float32) ** 2))
                         for x in jax.tree_util.tree_leaves(g0[name])))
        nd = np.sqrt(sum(
            float(jnp.sum((a.astype(jnp.float32)
                           - b.astype(jnp.float32)) ** 2))
            for a, b in zip(jax.tree_util.tree_leaves(g0[name]),
                            jax.tree_util.tree_leaves(g1[name]))))
        assert nd <= 1e-3 * max(n0, 1e-8), (name, nd, n0)


def test_avg_reprojection(setup):
    """cfg.avg_reprojection (monodepth2 mean-over-frames semantics; the
    reference declares the flag at options.py:150 but never consumes it):
    the planar and NHWC paths agree, and the mono loss genuinely moves
    off the min-reprojection value."""
    models, variables, batch = setup

    def mono_loss(c):
        _, (losses, _, _) = P.forward_train(
            models, variables, batch, c, jax.random.PRNGKey(3),
            use_z_bins=jnp.asarray(False))
        return float(losses["mono_loss"])

    avg_cfg = CFG.replace(avg_reprojection=True)
    m_nhwc = mono_loss(avg_cfg.replace(planar_losses=False))
    m_planar = mono_loss(avg_cfg.replace(planar_losses=True))
    m_min = mono_loss(CFG.replace(planar_losses=False))
    np.testing.assert_allclose(m_nhwc, m_planar, rtol=1e-5)
    # mean over source frames upper-bounds the per-pixel min
    assert m_nhwc > m_min + 1e-6


@pytest.mark.slow
def test_param_dtype_bfloat16_storage():
    """cfg.param_dtype='bfloat16' casts parameter STORAGE at init;
    BN running stats stay float32."""
    cfg = CFG.replace(param_dtype="bfloat16")
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    for m, v in variables.items():
        for leaf in jax.tree_util.tree_leaves(v["params"]):
            assert leaf.dtype == jnp.bfloat16, (m, leaf.dtype)
        for leaf in jax.tree_util.tree_leaves(dict(v).get("batch_stats",
                                                          {})):
            assert leaf.dtype == jnp.float32, (m, leaf.dtype)
    # the forward still runs on bf16-stored params
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 1))
    out = P.forward_infer(models, variables, batch, cfg)
    assert np.isfinite(np.asarray(out["depth_mvs"],
                                  dtype=np.float32)).all()


def test_photometric_losses_planar_heavy_remat():
    """Planar path under the batch-gated remat: loss matches the light
    planar trace (checkpoint structure mirrors the NHWC path)."""
    cfg = CFG.replace(disable_automasking=True)
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 2))

    def loss_fn(variables, c):
        total, _ = P.forward_train(models, variables, batch, c,
                                   jax.random.PRNGKey(3),
                                   use_z_bins=jnp.asarray(True))
        return total

    l0 = loss_fn(variables, cfg)
    l1 = loss_fn(variables, cfg.replace(remat_batch_threshold=0))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)


def test_multi_frame_matching():
    """Two matching frames (reference --use_future_frame /
    --num_matching_frames=2): the multi-frame cost weighting paths
    (softmax-max over groups at train, depth-axis at eval) run and both
    directions contribute (dropping the future frame changes the MVS
    depth)."""
    cfg = CFG.replace(matching_ids=(0, -1, 1))
    models = build_models(cfg)
    variables = S.init_variables(models, cfg, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 2))

    total, (losses, outputs, _) = P.forward_train(
        models, variables, batch, cfg, jax.random.PRNGKey(3),
        use_z_bins=jnp.asarray(False))
    assert np.isfinite(float(total))
    assert np.isfinite(np.asarray(outputs["depth_mvs"])).all()

    out2 = P.forward_infer(models, variables, batch, cfg)
    out1 = P.forward_infer(models, variables, batch,
                           cfg.replace(matching_ids=(0, -1)))
    d2, d1 = np.asarray(out2["depth_mvs"]), np.asarray(out1["depth_mvs"])
    assert np.isfinite(d2).all() and (d2 > 0).all()
    assert np.abs(d2 - d1).max() > 1e-6


def test_mask_mvs_dist_shape():
    """dist mask thresholds the dense full-res mono disparity."""
    cfg = CFG.replace(mask_mvs_dist=True, dist_thres=0.5)
    b, h, w = 2, cfg.height, cfg.width
    disp0 = jnp.linspace(0, 1, b * h * w).reshape(b, h, w)
    batch = {"color": jnp.zeros((b, 3, h, w, 3))}
    mask = P.compute_mvs_masks(None, disp0, batch, None, None, cfg)
    assert mask.shape == (b, h, w, 1)
    np.testing.assert_array_equal(
        np.asarray(mask[..., 0]), (np.asarray(disp0) > 0.5))


def test_multistep_matches_sequential():
    """steps_per_dispatch: K scanned steps == K sequential production
    steps -- same rng subkeys, same batches (the scan wraps the SAME
    step body; see PROFILE.md round 4 for the schedule motivation).

    Tolerances are two-tier, measured on this CPU backend: the K=1 scan
    reproduces the standalone step's loss exactly and its updated params
    to ~2e-7 (pure backward compile-order noise between the scanned and
    standalone XLA graphs; on the real TPU both are bit-identical). That
    ~1e-7 param noise then amplifies chaotically through step 2's
    discrete selections (min-reprojection argmin, automask), so step-2
    quantities only get loose bounds: measured loss[1] rel 6.4e-4, max
    param abs diff 1.4e-4 after two steps."""
    cfg = Config(height=64, width=96, batch_size=2, num_depth_bins=8,
                 compute_dtype="float32")
    models = build_models(cfg)
    state0, tx = S.create_train_state(models, cfg, jax.random.PRNGKey(0))
    step = S.make_train_step(models, cfg, tx)
    multi = S.make_train_multistep(models, cfg, tx)
    b1 = jax.tree.map(jnp.asarray, make_batch(cfg, 2, seed=1))
    b2 = jax.tree.map(jnp.asarray, make_batch(cfg, 2, seed=2))
    subs = [jax.random.PRNGKey(11), jax.random.PRNGKey(12)]
    zb = jnp.asarray(True)

    st = jax.tree.map(jnp.copy, state0)  # both paths donate their input
    st, l1, _ = step(st, b1, subs[0], zb)
    st, l2, _ = step(st, b2, subs[1], zb)

    # --- tight equivalence: K=1 scan vs one standalone step ---
    stacked1 = jax.tree.map(lambda a: jnp.stack([a], 0), b1)
    st_1, losses1 = multi(jax.tree.map(jnp.copy, state0), stacked1,
                          jnp.stack(subs[:1]), zb)
    np.testing.assert_allclose(float(losses1["loss"][0]),
                               float(l1["loss"]), rtol=1e-6)
    st_seq1, _, _ = S.make_train_step(models, cfg, tx)(
        jax.tree.map(jnp.copy, state0), b1, subs[0], zb)
    for a, b in zip(jax.tree.leaves(st_seq1.params),
                    jax.tree.leaves(st_1.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=3e-6)
    assert int(st_1.step) == 1

    # --- loose 2-step check: chaotic amplification bounds (see doc) ---
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b], 0), b1, b2)
    st_m, losses = multi(jax.tree.map(jnp.copy, state0), stacked,
                         jnp.stack(subs), zb)
    assert losses["loss"].shape == (2,)
    np.testing.assert_allclose(float(losses["loss"][0]), float(l1["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(losses["loss"][1]), float(l2["loss"]),
                               rtol=5e-3)
    for a, b in zip(jax.tree.leaves(st.params),
                    jax.tree.leaves(st_m.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=1e-3)
    assert int(st_m.step) == 2


@pytest.mark.slow
def test_kernel_l1_epilogue_parity(setup, monkeypatch):
    """cfg.kernel_l1 (the warp kernel's in-kernel L1 epilogue) must
    reproduce the XLA-tail formulation: bit-identical L1 values (verified
    exactly with automasking off below), with the automask-on losses
    agreeing up to min-tie flips -- rp = 0.85*sm + 0.15*l1 fuses
    differently (FMA) across the two graphs, so exact ties in the
    min-over-frames can resolve differently, same as the planar-parity
    test. The Pallas warp is forced on in interpret mode (the CPU test
    stand-in for the Mosaic path; _use_pallas_warp gates on TPU)."""
    import functools
    from movedepth_tpu.ops.pallas import image_warp as IW
    from movedepth_tpu.ops.pallas import sweep_warp as SW

    models, variables, batch = setup
    monkeypatch.setattr(P, "_use_pallas_warp", lambda cfg, train: True)
    for mod, name in ((IW, "warp_images_border"), (SW, "sweep_warp"),
                      (SW, "sweep_warp_corr")):
        orig = getattr(mod, name).__wrapped__  # un-jitted fn under jax.jit
        monkeypatch.setattr(mod, name,
                            functools.partial(orig, interpret=True))

    def loss_fn(variables, c):
        total, (losses, _, _) = P.forward_train(
            models, variables, batch, c, jax.random.PRNGKey(3),
            use_z_bins=jnp.asarray(False))
        return total, losses

    # bit-exact with automasking off (no min ties to flip)
    nomask = CFG.replace(disable_automasking=True)
    e0, _ = loss_fn(variables, nomask.replace(kernel_l1=False))
    e1, _ = loss_fn(variables, nomask.replace(kernel_l1=True))
    assert float(e0) == float(e1), (float(e0), float(e1))

    (l0, d0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
        variables, CFG.replace(kernel_l1=False))
    (l1, d1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        variables, CFG.replace(kernel_l1=True))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    assert set(d0) == set(d1)
    for k in d0:
        # 5e-4: min-tie flips concentrate at the coarsest scale on
        # near-uniform synthetic reprojections; the automask-off gate
        # above is the exact-parity proof
        np.testing.assert_allclose(float(d0[k]), float(d1[k]), rtol=5e-4,
                                   atol=1e-7, err_msg=k)
    for name in g0:
        n0 = np.sqrt(sum(float(jnp.sum(x.astype(jnp.float32) ** 2))
                         for x in jax.tree_util.tree_leaves(g0[name])))
        nd = np.sqrt(sum(
            float(jnp.sum((a.astype(jnp.float32)
                           - b.astype(jnp.float32)) ** 2))
            for a, b in zip(jax.tree_util.tree_leaves(g0[name]),
                            jax.tree_util.tree_leaves(g1[name]))))
        # same bound rationale as the remat-equivalence test: tie-flips
        # give O(1e-3) relative on synthetic data, structural errors O(1)
        assert nd <= 3e-2 * max(n0, 1e-8), (name, nd, n0)

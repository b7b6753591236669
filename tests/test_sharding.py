"""Multi-device tests on the virtual 8-device CPU mesh: mesh construction,
batch sharding, and data-parallel == single-device consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from movedepth_tpu.config import Config
from movedepth_tpu.models import build_models
from movedepth_tpu.data.synthetic import make_batch
from movedepth_tpu.parallel import mesh as M
from movedepth_tpu.train import state as S

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_make_mesh_shapes():
    mesh = M.make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    mesh2 = M.make_mesh(model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_all_devices():
    mesh = M.make_mesh()
    batch = {"x": np.zeros((8, 4, 4), np.float32)}
    sharded = M.shard_batch(batch, mesh)
    assert len(sharded["x"].sharding.device_set) == 8


def test_multistep_composes_with_mesh():
    """make_train_multistep (steps_per_dispatch > 1) under a (data=4,
    model=2) mesh: the scanned K-step dispatch compiles and runs with the
    stacked batch sharded by shard_stacked_batch (step axis replicated,
    batch axis over 'data') and a replicated state, producing finite
    per-step losses and advancing the step counter."""
    cfg = Config(height=32, width=64, batch_size=4, num_depth_bins=8,
                 compute_dtype="float32")
    models = build_models(cfg)
    state, tx = S.create_train_state(models, cfg, jax.random.PRNGKey(0),
                                     steps_per_epoch=10)
    multi = S.make_train_multistep(models, cfg, tx)
    b1 = make_batch(cfg, 4, seed=1)
    b2 = make_batch(cfg, 4, seed=2)
    stacked = jax.tree.map(lambda a, b: jnp.stack(
        [jnp.asarray(a), jnp.asarray(b)], 0), b1, b2)
    subs = jnp.stack([jax.random.PRNGKey(11), jax.random.PRNGKey(12)])

    mesh = M.make_mesh(model=2)
    with M.activate_mesh(mesh):
        st = M.replicate(state, mesh)
        sb = M.shard_stacked_batch(stacked, mesh)
        assert len(sb["color"].sharding.device_set) == 8
        new_state, losses = multi(
            st, sb, jax.device_put(subs, M.replicated(mesh)),
            jax.device_put(jnp.asarray(False), M.replicated(mesh)))
    assert losses["loss"].shape == (2,)
    vals = np.asarray(losses["loss"])
    assert np.isfinite(vals).all()
    assert int(new_state.step) == 2


@pytest.mark.slow
def test_dp_matches_single_device():
    """The sharded train step must produce the same loss and grads as the
    single-device run on the same global batch (DDP-consistency, the
    property the reference gets from NCCL all-reduce)."""
    cfg = Config(height=32, width=64, batch_size=8, num_depth_bins=8,
                 compute_dtype="float32")
    models = build_models(cfg)
    state, tx = S.create_train_state(models, cfg, jax.random.PRNGKey(0),
                                     steps_per_epoch=10)
    step = S.make_train_step(models, cfg, tx)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 8))
    rng = jax.random.PRNGKey(1)
    uz = jnp.asarray(False)

    # the train step donates its input state; keep a copy for the DP run
    state_dp = jax.tree.map(jnp.copy, state)
    old_params = jax.tree.map(jnp.copy, state.params)
    state_single, losses_single, _ = step(state, batch, rng, uz)

    mesh = M.make_mesh()  # 8-way data parallel
    with M.activate_mesh(mesh):
        b = M.shard_batch(batch, mesh)
        st = M.replicate(state_dp, mesh)
        new_state, losses_dp, _ = step(st, b, jax.device_put(
            rng, M.replicated(mesh)), jax.device_put(uz, M.replicated(mesh)))
        dp_loss = float(losses_dp["loss"])

    assert np.isfinite(dp_loss)
    # DP and single-device differ only by float reassociation (sharded
    # reductions, SyncBN pmean order; the decoder's subpixel-folded conv
    # schedules reassociate further); measured drift is ~3-6e-4 relative
    # on this synthetic batch. Check the FULL loss dict, not just the
    # scalar total -- a mis-sharded branch can average out in the sum.
    # Individual components see more relative drift than the total: the
    # min-reprojection / automask / localmax comparisons are discrete, so
    # reassociation-level drift flips a few per-pixel winners (measured
    # 7.3e-3 on 'loss/3'). A genuinely mis-sharded branch is O(1) off.
    np.testing.assert_allclose(dp_loss, float(losses_single["loss"]),
                               rtol=1.5e-3)
    for k in losses_single:
        np.testing.assert_allclose(
            float(losses_dp[k]), float(losses_single[k]), rtol=2e-2,
            atol=1e-6, err_msg=f"loss component {k!r}")

    # And the updated PARAMETER pytree, leaf by leaf: compare the Adam
    # update deltas (new - old), which carry the gradient signal directly;
    # comparing raw params would hide a bad branch under the O(1) init
    # magnitudes. On the first Adam step each delta is ~ lr*sign(grad)
    # (m/sqrt(v) = sign at step 1), so elements whose gradient sign is
    # borderline flip the FULL +-1e-4 under reassociation-level drift and
    # the discrete min/automask winner flips (measured: 0.35% of one
    # decoder leaf). Element-wise tightness is therefore impossible;
    # instead require per leaf that (a) <=1% of elements mismatch at
    # (atol=2e-5, rtol=0.05) and (b) the relative l2 error of the delta
    # is <=0.2. A mis-sharded branch moves essentially ALL elements
    # (fraction ~50%+, relative norm ~1.4).
    flat_s = jax.tree_util.tree_flatten_with_path(state_single.params)[0]
    flat_dp = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    flat_old = jax.tree_util.tree_flatten_with_path(old_params)[0]
    assert len(flat_s) == len(flat_dp) == len(flat_old) > 100
    for (path, leaf_s), (_, leaf_dp), (_, leaf_old) in zip(
            flat_s, flat_dp, flat_old):
        d_s = np.asarray(leaf_s, np.float64) - np.asarray(leaf_old,
                                                          np.float64)
        d_dp = np.asarray(leaf_dp, np.float64) - np.asarray(leaf_old,
                                                            np.float64)
        name = jax.tree_util.keystr(path)
        err = np.abs(d_dp - d_s)
        bad = int((err > (2e-5 + 0.05 * np.abs(d_s))).sum())
        # small leaves (BN scales, 64-256 elems) make a pure fraction
        # criterion granular: allow max(8 elements, 2%) per leaf
        # (measured worst observed flip count: 4/256 on a BN scale when
        # one executable comes from the cross-machine AOT cache).
        allowed = max(8, int(0.02 * d_s.size))
        assert bad <= allowed, (
            f"param delta at {name}: {bad}/{d_s.size} elements mismatch "
            f"(max abs err {err.max():.3e})")
        rel = float(np.linalg.norm(d_dp - d_s) /
                    (np.linalg.norm(d_s) + 1e-12))
        # k sign-flipped elements give rel ~ 2*sqrt(k/size); allow ~9
        # flips on small leaves, 0.2 on large ones.
        assert rel <= max(0.2, 6.0 / np.sqrt(d_s.size)), (
            f"param delta at {name}: relative l2 {rel:.3f}")

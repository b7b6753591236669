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
    _, losses_single, _ = step(state, batch, rng, uz)

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
    # on this synthetic batch.
    np.testing.assert_allclose(dp_loss, float(losses_single["loss"]),
                               rtol=1.5e-3)

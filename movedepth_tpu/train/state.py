"""Train state, optimizer and the jitted train step.

Replaces the reference's Trainer optimizer/epoch plumbing
(reference: movedepth/trainer.py:137-141,244-295) with a functional
TrainState + optax:
  * Adam with two LR groups -- the MVS group (mask_cnn, mvs_encoder, reg3d)
    runs at lr * lr_fac (reference: trainer.py:42-44,102-123,137-140) --
    via optax.multi_transform labeled by top-level model name;
  * StepLR x0.1 every ``scheduler_step_size`` epochs as an optax
    piecewise-constant schedule over steps (reference: trainer.py:141).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from movedepth_tpu.config import Config, xla_compiler_options
from movedepth_tpu.pipeline import forward_train

# models updated at base LR vs lr*lr_fac (reference: trainer.py:67-131)
MAIN_GROUP = ("mono_encoder", "mono_depth", "pose_encoder", "pose", "up")
MVS_GROUP = ("mask_cnn", "mvs_encoder", "reg3d")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def init_variables(models: Dict[str, Any], cfg: Config, rng) -> Dict:
    """Initialize all model variables with dummy batches (shapes only).

    The whole init runs under one jit so thousands of tiny parameter
    initializers become a single compiled program instead of op-by-op
    dispatches.
    """
    h, w = cfg.height, cfg.width
    hp, wp = cfg.prior_hw

    def _init(rng):
        img = jnp.zeros((1, h, w, 3), jnp.float32)
        variables = {}
        keys = jax.random.split(rng, 8)
        variables["mono_encoder"] = models["mono_encoder"].init(
            keys[0], img, False)
        feats = models["mono_encoder"].apply(variables["mono_encoder"], img,
                                             False)
        variables["mono_depth"] = models["mono_depth"].init(keys[1], feats)
        if "pose_encoder" in models:
            img6 = jnp.zeros((1, h, w, 6), jnp.float32)
            variables["pose_encoder"] = models["pose_encoder"].init(
                keys[2], img6, False)
            pf = models["pose_encoder"].apply(variables["pose_encoder"],
                                              img6, False)
            variables["pose"] = models["pose"].init(keys[3], [pf])
        variables["mvs_encoder"] = models["mvs_encoder"].init(
            keys[4], img, False)
        match, ctx = models["mvs_encoder"].apply(variables["mvs_encoder"],
                                                 img, False)
        del match
        vol = jnp.zeros((1, cfg.num_depth_bins, hp, wp, cfg.reg3d_c),
                        jnp.float32)
        variables["reg3d"] = models["reg3d"].init(keys[5], vol, False)
        ent = jnp.zeros((1, hp, wp, 1), jnp.float32)
        variables["mask_cnn"] = models["mask_cnn"].init(keys[6], ent, False)
        if "up" in models:
            variables["up"] = models["up"].init(keys[7], ctx)

        pd = jnp.dtype(cfg.param_dtype)
        if pd != jnp.float32:
            # parameter STORAGE dtype (config.param_dtype): cast the
            # "params" collections only -- BN running stats keep float32
            # so long-horizon stat accumulation does not lose precision.
            variables = {
                m: dict(v, params=jax.tree.map(
                    lambda x: x.astype(pd), v["params"]))
                for m, v in variables.items()
            }
        return variables

    return jax.jit(_init)(rng)


def split_variables(variables: Dict) -> Tuple[Dict, Dict]:
    params = {k: v["params"] for k, v in variables.items()}
    stats = {k: v.get("batch_stats", {}) for k, v in variables.items()}
    return params, stats


def combine_variables(params: Dict, stats: Dict) -> Dict:
    out = {}
    for k in params:
        v = {"params": params[k]}
        if stats.get(k):
            v["batch_stats"] = stats[k]
        out[k] = v
    return out


def lr_schedule(cfg: Config, steps_per_epoch: int, base_lr: float):
    """torch StepLR(step_size, gamma=0.1) over optimizer steps."""
    boundaries = {}
    e = cfg.scheduler_step_size
    while e < cfg.num_epochs:
        boundaries[e * steps_per_epoch] = 0.1
        e += cfg.scheduler_step_size
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def create_optimizer(cfg: Config, steps_per_epoch: int,
                     params) -> optax.GradientTransformation:
    main = optax.adam(lr_schedule(cfg, steps_per_epoch, cfg.learning_rate))
    mvs = optax.adam(
        lr_schedule(cfg, steps_per_epoch, cfg.learning_rate * cfg.lr_fac))
    labels = {k: ("mvs" if k in MVS_GROUP else "main") for k in params}
    return optax.multi_transform({"main": main, "mvs": mvs}, labels)


def create_train_state(models, cfg: Config, rng,
                       steps_per_epoch: int = 1000) -> Tuple[TrainState, Any]:
    variables = init_variables(models, cfg, rng)
    params, stats = split_variables(variables)
    tx = create_optimizer(cfg, steps_per_epoch, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=stats,
        opt_state=tx.init(params),
    )
    return state, tx




def make_train_step(models, cfg: Config, tx):
    """Build the jitted train step: grads + Adam update + BN stats merge.

    The gradient all-reduce across the data mesh axis is inserted by GSPMD
    from the batch sharding -- no explicit psum (the TPU replacement for
    DDP's backward hooks, reference: trainer.py:133-135,270-272).
    """
    step = _train_step_body(models, cfg, tx)
    # donate the state: params/opt-state buffers are reused in place
    return jax.jit(step, donate_argnums=(0,),
                   compiler_options=xla_compiler_options(cfg))


def _train_step_body(models, cfg: Config, tx):
    def step(state: TrainState, batch, rng, use_z_bins):
        def loss_fn(params):
            variables = combine_variables(params, state.batch_stats)
            total, aux = forward_train(models, variables, batch, cfg, rng,
                                       use_z_bins)
            return total, aux

        (_, (losses, outputs, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_stats = dict(state.batch_stats)
        for k, v in updates.items():
            new_stats[k] = v
        upd, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, losses, outputs

    return step


def make_train_multistep(models, cfg: Config, tx):
    """K real train steps per device dispatch, as one on-device lax.scan.

    Measured on chip (PROFILE.md round 4, "Shipped multistep"): NOT a
    single-chip throughput win. With real distinct per-step batches this
    scan runs 953.2 ms/step at batch 16 (K=4) vs ~701 ms for the
    production single-step dispatch; the earlier harness-scan numbers
    that motivated it (552.9 ms undonated / 732.8 donated) reused ONE
    loop-constant batch, letting XLA hoist batch-derived work out of the
    loop -- unreachable in real training. The state is still not donated
    (the donated harness carry measured slower, and the double-buffered
    params+Adam state fit: 13.90 GB temp HBM at batch 16). The option
    exists for dispatch-latency-bound deployments (per-step host dispatch
    is ~zero on this tunnel but not on every orchestrator). Semantics are
    EXACTLY K sequential make_train_step calls: the caller passes the
    same rng subkeys the sequential loop would draw (pinned by
    tests/test_pipeline.py::test_multistep_matches_sequential).

    Args to the returned jit: (state, batches, rngs, use_z_bins) where
    every batch leaf and rng is stacked on a leading K axis. Returns
    (new_state, losses) with each loss stacked (K,); the per-step image
    outputs are not materialized (they exist for logging only -- the
    trainer recomputes them out of band at log events).
    """
    step = _train_step_body(models, cfg, tx)

    def multi(state: TrainState, batches, rngs, use_z_bins):
        def body(st, xs):
            batch, rng = xs
            st2, losses, _ = step(st, batch, rng, use_z_bins)
            return st2, losses

        new_state, losses = jax.lax.scan(body, state, (batches, rngs))
        return new_state, losses

    # no donate_argnums: see docstring (donated carry measured slower)
    return jax.jit(multi, compiler_options=xla_compiler_options(cfg))

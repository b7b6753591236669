"""High-level training orchestrator (epoch loop, logging, checkpoints).

Functional counterpart of the reference Trainer class
(reference: movedepth/trainer.py:33-295). Differences by design:

  * one jitted train step contains the whole forward/backward; parallelism
    is a jax Mesh (parallel/mesh.py), not DDP process groups;
  * checkpoints are atomic Orbax TrainStates (train/checkpoints.py), saved
    every ``save_frequency`` epochs and always as ``last`` -- the
    reference's epoch>15 save gate (trainer.py:255) is intentionally not
    reproduced (it silently discards early checkpoints);
  * randomness is a threaded jax PRNG key, seeded once.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from movedepth_tpu.config import Config, validate
from movedepth_tpu.models import build_models
from movedepth_tpu import pipeline as P
from movedepth_tpu.data.kitti import (
    KITTIRawDataset,
    KITTIOdomDataset,
    KITTIDepthDataset,
    readlines,
)
from movedepth_tpu.data.loader import Loader
from movedepth_tpu.parallel import mesh as M
from movedepth_tpu.train import state as S
from movedepth_tpu.train import checkpoints as C
from movedepth_tpu.train.logging import MetricsLogger
from movedepth_tpu.train.torch_import import (
    load_reference_checkpoint,
    load_imagenet_encoders,
)

DATASETS = {
    "kitti": KITTIRawDataset,
    "kitti_odom": KITTIOdomDataset,
    "kitti_depth": KITTIDepthDataset,  # annotated-GT variant
    # (reference: trainer.py:151-153)
}


def garg_depth_metrics(depth_pred: np.ndarray, depth_gt: np.ndarray) -> Dict:
    """During-training GT metrics with the garg crop at 375x1242
    (reference: movedepth/trainer.py:726-757)."""
    import cv2

    names = ["de/abs_rel", "de/sq_rel", "de/rms", "de/log_rms", "da/a1",
             "da/a2", "da/a3"]
    accs = []
    for i in range(depth_pred.shape[0]):
        pred = cv2.resize(depth_pred[i], (1242, 375))
        pred = np.clip(pred, 1e-3, 80)
        gt = depth_gt[i]
        mask = (gt > 1e-3) & (gt < 80)
        crop = np.zeros_like(mask)
        crop[153:371, 44:1197] = True
        mask &= crop
        if mask.sum() == 0:
            continue
        p, g = pred[mask], gt[mask]
        p *= np.median(g) / np.median(p)
        p = np.clip(p, 1e-3, 80)
        thresh = np.maximum(g / p, p / g)
        accs.append([
            np.mean(np.abs(g - p) / g),
            np.mean((g - p) ** 2 / g),
            np.sqrt(np.mean((g - p) ** 2)),
            np.sqrt(np.mean((np.log(g) - np.log(p)) ** 2)),
            (thresh < 1.25).mean(),
            (thresh < 1.25 ** 2).mean(),
            (thresh < 1.25 ** 3).mean(),
        ])
    if not accs:
        return {}
    return dict(zip(names, np.mean(accs, 0)))


class Trainer:
    """End-to-end training driver."""

    def __init__(self, cfg: Config, split_dir: Optional[str] = None,
                 mesh=None, rank: int = 0, world_size: int = 1,
                 profile_steps: int = 0):
        self.cfg = validate(cfg)
        self.rank = rank
        self.world_size = world_size
        self.mesh = mesh
        self.log_path = os.path.join(cfg.log_dir, cfg.model_name)

        self.models = build_models(cfg)
        self._device_batch = None

        # DATA (reference: trainer.py:154-198)
        dataset_cls = DATASETS[cfg.dataset]
        split_dir = split_dir or os.path.join(
            os.path.dirname(__file__), "..", "splits", cfg.split)
        img_ext = ".png" if cfg.png else ".jpg"
        train_files = readlines(os.path.join(split_dir, "train_files.txt"))
        val_files = readlines(os.path.join(split_dir, "val_files.txt"))
        self.train_dataset = dataset_cls(
            cfg.data_path, train_files, cfg.height, cfg.width, cfg.frame_ids,
            is_train=True, img_ext=img_ext, load_pose=cfg.load_pose,
            seed=cfg.seed, native=cfg.native_loader, rt=cfg.robust_train)
        self.val_dataset = dataset_cls(
            cfg.data_path, val_files, cfg.height, cfg.width, cfg.frame_ids,
            is_train=False, img_ext=img_ext, load_pose=cfg.load_pose,
            seed=cfg.seed, native=cfg.native_loader)
        self.train_loader = Loader(
            self.train_dataset, cfg.batch_size, rank, world_size,
            shuffle=True, drop_last=True, num_workers=cfg.num_workers,
            seed=cfg.seed)
        self.val_loader = Loader(
            self.val_dataset, cfg.batch_size, rank, world_size,
            shuffle=False, drop_last=False, num_workers=4, seed=cfg.seed)

        steps_per_epoch = max(1, len(self.train_loader))
        self.steps_per_epoch = steps_per_epoch
        self.num_total_steps = steps_per_epoch * cfg.num_epochs

        # STATE + OPTIMIZER
        self.state, self.tx = S.create_train_state(
            self.models, cfg, jax.random.PRNGKey(cfg.seed), steps_per_epoch)
        self.train_step = S.make_train_step(self.models, cfg, self.tx)
        if cfg.steps_per_dispatch > 1:
            self.train_multistep = S.make_train_multistep(
                self.models, cfg, self.tx)
        self._val_forward = jax.jit(
            lambda v, b, rng, uz: P.forward_train(
                self.models, v, b, cfg, rng, uz, train=False)[1][:2])

        # ImageNet init (reference: trainer.py:67,84 builds each ResNet
        # encoder with pretrained=weights_init=='pretrained')
        if cfg.weights_init == "pretrained":
            converted = load_imagenet_encoders(cfg)
            if converted:
                params = dict(self.state.params)
                stats = dict(self.state.batch_stats)
                for name, variables in converted.items():
                    if name not in params:
                        continue
                    params[name] = variables["params"]
                    if "batch_stats" in variables:
                        stats[name] = variables["batch_stats"]
                self.state = self.state.replace(params=params,
                                                batch_stats=stats)
                if rank == 0:
                    print(f"ImageNet init: {sorted(converted)}")
            elif rank == 0:
                print("WARNING: weights_init='pretrained' but no "
                      f"pretrain_resnet/resnet{cfg.res_arch}-*.pth found "
                      "(searched ./pretrain_resnet, $PRETRAIN_RESNET_DIR, "
                      "repo root) -- falling back to scratch init")

        # LOADING (reference: trainer.py:143-147)
        if cfg.load_weights_folder:
            self.load_weights(cfg.load_weights_folder)
        if cfg.mono_weights_folder:
            self.load_mono_weights(cfg.mono_weights_folder)

        self.logger = MetricsLogger(self.log_path, rank, cfg.batch_size,
                                    self.num_total_steps)
        if rank == 0:
            C.save_config(self.log_path, cfg)

        # True multi-process run (the torch.distributed.launch regime,
        # reference: train_movedepth.sh:15): every host built the same
        # state (same seed / same restored checkpoint), so replicate it
        # onto the global mesh explicitly -- process-local arrays cannot
        # feed a computation spanning other processes' devices.
        self._mp = mesh is not None and M.is_multiprocess(mesh)
        self._regather = None
        if self._mp:
            self.state = M.replicate(self.state, mesh)

        self.epoch = 0
        # Resume continues the epoch clock: the optimizer step count lives
        # in the TrainState (restored above), so a mid-training restore
        # resumes at step//steps_per_epoch instead of silently restarting
        # the z-bin schedule and checkpoint numbering at epoch 0 (the
        # reference restarts: movedepth/trainer.py:250, and its StepLR
        # state is a separate adam.pth callers routinely omit).
        self.step = int(self.state.step)
        self.rng = jax.random.PRNGKey(cfg.seed + 1)
        self._val_iter = None
        # profiling hook (the reference has none, SURVEY.md section 5):
        # capture a jax.profiler device trace of steps [2, 2+profile_steps)
        self.profile_steps = profile_steps
        self._profiling = False

    # ------------------------------------------------------------- loading

    def load_weights(self, folder: str):
        """Resume: Orbax TrainState dir, or reference torch .pth folder."""
        if any(f.endswith(".pth") for f in os.listdir(folder)):
            converted = load_reference_checkpoint(folder, self.cfg)
            params = dict(self.state.params)
            stats = dict(self.state.batch_stats)
            for name, variables in converted.items():
                params[name] = variables["params"]
                if "batch_stats" in variables:
                    stats[name] = variables["batch_stats"]
            self.state = self.state.replace(params=params, batch_stats=stats)
        else:
            self.state = C.restore_checkpoint(folder, self.state)

    def load_mono_weights(self, folder: str):
        """Warm-start the mono+pose branch (reference: trainer.py:833-844)."""
        names = ("pose_encoder", "pose", "mono_encoder", "mono_depth")
        if any(f.endswith(".pth") for f in os.listdir(folder)):
            cfg = self.cfg.replace(models_to_load=names)
            converted = load_reference_checkpoint(folder, cfg)
            params = dict(self.state.params)
            stats = dict(self.state.batch_stats)
            for name, variables in converted.items():
                params[name] = variables["params"]
                if "batch_stats" in variables:
                    stats[name] = variables["batch_stats"]
            self.state = self.state.replace(params=params, batch_stats=stats)
        else:
            params, stats = C.restore_partial_params(
                folder, self.state.params, self.state.batch_stats, names)
            self.state = self.state.replace(params=params, batch_stats=stats)

    # ------------------------------------------------------------- running

    def _put(self, batch):
        device_batch = {k: v for k, v in batch.items() if k != "depth_gt"}
        if self.mesh is not None:
            return M.shard_batch(device_batch, self.mesh)
        return jax.tree.map(jnp.asarray, device_batch)

    def _rep(self, x):
        """Replicate a per-step scalar/key onto a multi-process mesh
        (every rank derives the identical value from the shared seed)."""
        if self._mp:
            return M.replicate(x, self.mesh)
        return x

    def _host_state(self):
        """Host copy of the state for checkpoint writes.

        Multi-process: GSPMD may have left some leaves sharded over the
        mesh (e.g. model-axis-sharded reg3d kernels), so re-gather to
        replicated with a collective identity program -- EVERY rank must
        call this at the same point (the write itself is rank-0-gated by
        the callers).
        """
        if not self._mp:
            return self.state
        if self._regather is None:
            self._regather = jax.jit(
                lambda t: t, out_shardings=M.replicated(self.mesh))
        return jax.tree.map(M.local_array, self._regather(self.state))

    def _put_stacked(self, batches):
        """Stack K host batches on a leading step axis and place them."""
        stacked = {
            k: np.stack([b[k] for b in batches], 0)
            for k in batches[0] if k != "depth_gt"
        }
        stacked = jax.tree.map(jnp.asarray, stacked)
        if self.mesh is not None:
            stacked = M.shard_stacked_batch(stacked, self.mesh)
        return stacked

    def _log_cadence(self, batch_idx, step):
        cfg = self.cfg
        early = (batch_idx % max(1, cfg.log_frequency // self.world_size)
                 == 0 and step < 2000)
        return early or step % 2000 == 0

    def run_epoch_multistep(self, use_z):
        """cfg.steps_per_dispatch real steps per device call (on-device
        lax.scan of the production step; for dispatch-latency-bound
        deployments -- measured SLOWER than single-step dispatch on this
        single-chip tunnel, PROFILE.md round 4 "Shipped multistep", so
        the default stays 1). The scanned
        steps consume the same rng split chain and step/batch_idx
        accounting as the sequential loop; at log events the image
        outputs are recomputed out of band with one extra rng split (the
        scan does not materialize them), and the tail of an epoch
        shorter than K runs as plain production steps. profile_steps
        tracing applies only to the sequential loop."""
        cfg = self.cfg
        k = cfg.steps_per_dispatch
        group, it = [], self.train_loader.epoch(self.epoch)
        batch_idx = 0
        while True:
            group = [b for _, b in zip(range(k), it)]
            if len(group) < k:
                break  # tail: finish with single production steps
            t0 = time.time()
            subs = []
            for _ in range(k):
                self.rng, sub = jax.random.split(self.rng)
                subs.append(sub)
            stacked = self._put_stacked(group)
            self.state, losses = self.train_multistep(
                self.state, stacked, self._rep(jnp.stack(subs)), use_z)
            dt = (time.time() - t0) / k
            for s in range(k):
                if self._log_cadence(batch_idx + s, self.step + s):
                    host_losses = {n: float(M.local_array(v)[s])
                                   for n, v in losses.items()}
                    self.logger.log_time(self.epoch, batch_idx + s,
                                         self.step + s, dt,
                                         host_losses["loss"])
                    # recompute outputs for panels/garg metrics (sparse)
                    self.rng, sub2 = jax.random.split(self.rng)
                    variables = S.combine_variables(self.state.params,
                                                    self.state.batch_stats)
                    _, outputs = self._val_forward(
                        variables, self._put(group[s]), self._rep(sub2),
                        use_z)
                    if "depth_gt" in group[s]:
                        host_losses.update(garg_depth_metrics(
                            np.asarray(outputs["depth_mono"]),
                            group[s]["depth_gt"]))
                    self.logger.log_scalars("train", host_losses,
                                            self.step + s)
                    self.logger.log_images("train", group[s], outputs,
                                           self.step + s)
                    self.validate(use_z)
                if (cfg.save_intermediate_models
                        and (self.step + s) % 2000 == 0):
                    # per-step snapshot dirs (reference: trainer.py:291-292)
                    # NB: intra-group states are never materialized, so the
                    # snapshot holds the end-of-group state (<= K-1 steps
                    # ahead of its label).
                    host_state = self._host_state()
                    if self.rank == 0:
                        C.save_checkpoint(self.log_path, host_state,
                                          self.epoch, step=self.step + s)
            self.step += k
            batch_idx += k
        for batch in group:  # tail (< k batches left in the epoch)
            self.rng, sub = jax.random.split(self.rng)
            self.state, losses, _ = self.train_step(
                self.state, self._put(batch), sub, use_z)
            self.step += 1
            batch_idx += 1

    def run_epoch(self):
        cfg = self.cfg
        use_z = self._rep(jnp.asarray(self.epoch > cfg.ztrans_start_epc))
        if cfg.steps_per_dispatch > 1:
            return self.run_epoch_multistep(use_z)
        for batch_idx, batch in enumerate(self.train_loader.epoch(self.epoch)):
            t0 = time.time()
            if self.profile_steps and self.rank == 0:
                if self.step == 2 and not self._profiling:
                    jax.profiler.start_trace(
                        os.path.join(self.log_path, "profile"))
                    self._profiling = True
                elif self._profiling and self.step == 2 + self.profile_steps:
                    jax.profiler.stop_trace()
                    self._profiling = False
            self.rng, sub = jax.random.split(self.rng)
            device_batch = self._put(batch)
            self.state, losses, outputs = self.train_step(
                self.state, device_batch, self._rep(sub), use_z)

            late = self.step % 2000 == 0
            if self._log_cadence(batch_idx, self.step):
                loss_val = float(M.local_array(losses["loss"]))
                self.logger.log_time(self.epoch, batch_idx, self.step,
                                     time.time() - t0, loss_val)
                host_losses = {k: float(M.local_array(v))
                               for k, v in losses.items()}
                if "depth_gt" in batch:
                    host_losses.update(garg_depth_metrics(
                        M.local_array(outputs["depth_mono"]),
                        batch["depth_gt"]))
                self.logger.log_scalars("train", host_losses, self.step)
                self.logger.log_images("train", batch, outputs, self.step)
                self.validate(use_z)
            if cfg.save_intermediate_models and late:
                # per-step snapshot dirs (reference: trainer.py:291-292);
                # _host_state is collective (all ranks), write is rank-0
                host_state = self._host_state()
                if self.rank == 0:
                    C.save_checkpoint(self.log_path, host_state,
                                      self.epoch, step=self.step)
            self.step += 1

    def validate(self, use_z):
        """Single val minibatch (reference: trainer.py:470-489)."""
        if self._val_iter is None:
            self._val_iter = self.val_loader.epoch(self.epoch)
        try:
            batch = next(self._val_iter)
        except StopIteration:
            self._val_iter = self.val_loader.epoch(self.epoch)
            batch = next(self._val_iter)
        self.rng, sub = jax.random.split(self.rng)
        variables = S.combine_variables(self.state.params,
                                        self.state.batch_stats)
        losses, outputs = self._val_forward(variables, self._put(batch),
                                            self._rep(sub), use_z)
        host_losses = {k: float(M.local_array(v)) for k, v in losses.items()}
        if "depth_gt" in batch:
            host_losses.update(garg_depth_metrics(
                M.local_array(outputs["depth_mono"]), batch["depth_gt"]))
        self.logger.log_scalars("val", host_losses, self.step)
        self.logger.log_images("val", batch, outputs, self.step)

    def train(self):
        cfg = self.cfg
        # derive the resume epoch from the restored optimizer step (a fresh
        # state has step 0 -> start_epoch 0); use_z / StepLR / checkpoint
        # numbering all continue where the saved run left off.
        start_epoch = min(self.step // self.steps_per_epoch, cfg.num_epochs)
        for self.epoch in range(start_epoch, cfg.num_epochs):
            self.run_epoch()
            if (self.epoch + 1) % cfg.save_frequency == 0:
                host_state = self._host_state()
                if self.rank == 0:
                    C.save_checkpoint(self.log_path, host_state, self.epoch)
        host_state = self._host_state()
        if self.rank == 0:
            C.save_checkpoint(self.log_path, host_state, last=True)
        self.logger.close()

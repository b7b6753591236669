"""Orbax checkpointing + experiment-config persistence.

Replaces the reference's per-model .pth dumps and filtered partial restore
(reference: movedepth/trainer.py:796-880) with a single atomic Orbax
checkpoint of the full TrainState (params + BN stats + Adam state + step)
per epoch, plus the reference's ``opt.json``-style config record
(trainer.py:796-805). Reference torch checkpoints load through
train/torch_import.py instead.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from movedepth_tpu.config import Config


def _ckpt_dir(log_path: str, epoch: Optional[int], step: Optional[int],
              last: bool) -> str:
    if last:
        name = "last"
    elif step is not None:
        name = f"weights_{epoch}_{step}"
    else:
        name = f"weights_{epoch}"
    return os.path.abspath(os.path.join(log_path, "models", name))


def save_config(log_path: str, cfg: Config) -> str:
    """opt.json parity (reference: trainer.py:796-805)."""
    models_dir = os.path.join(log_path, "models")
    os.makedirs(models_dir, exist_ok=True)
    path = os.path.join(models_dir, "opt.json")
    with open(path, "w") as f:
        f.write(cfg.to_json())
    return path


def _checkpointer():
    """Single-process-scoped checkpointer.

    Saves here are rank-0-gated by the Trainer (the reference's write-once
    contract, trainer.py:810), and restores run independently per process
    -- so in a multi-process run the default Orbax barriers (which expect
    EVERY process to enter save/restore) would deadlock. Scope the barrier
    set to this process alone; state is host numpy by then.
    """
    if jax.process_count() > 1:
        me = jax.process_index()
        opts = ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f"p{me}")
        return ocp.Checkpointer(ocp.StandardCheckpointHandler(),
                                multiprocessing_options=opts)
    return ocp.StandardCheckpointer()


def save_checkpoint(log_path: str, state: Any, epoch: Optional[int] = None,
                    step: Optional[int] = None, last: bool = False) -> str:
    path = _ckpt_dir(log_path, epoch, step, last)
    with _checkpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def restore_checkpoint(path: str, state_template: Any) -> Any:
    with _checkpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), state_template)


def restore_partial_params(path: str, params: dict, batch_stats: dict,
                           names) -> tuple:
    """Filtered partial restore of selected models' params AND BN stats
    (mono warm start; reference: trainer.py:833-844 restores the full
    state dict per model, so running_mean/var come along — a warmed mono
    encoder with fresh BN stats would emit a garbage depth prior)."""
    with _checkpointer() as ckptr:
        full = ckptr.restore(os.path.abspath(path))
    out_p, out_s = dict(params), dict(batch_stats)
    for n in names:
        if n in full.get("params", {}):
            out_p[n] = full["params"][n]
        if n in full.get("batch_stats", {}):
            out_s[n] = full["batch_stats"][n]
    return out_p, out_s

"""Training observability: tensorboard scalars/images + terminal ETA.

(reference: movedepth/trainer.py:759-793,883-911 -- tensorboardX writers,
plasma-colormapped disparity panels, examples/s + ETA printout; rank-0
gated.) Falls back to a JSONL metrics file when tensorboardX is absent.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np

from movedepth_tpu.parallel.mesh import local_array


def colormap(x: np.ndarray, normalize: bool = True) -> np.ndarray:
    """(H, W) -> (3, H, W) plasma colormap (reference: trainer.py:883-911)."""
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap("plasma", 256)
    v = np.asarray(x, dtype=np.float32)
    if normalize:
        ma, mi = float(v.max()), float(v.min())
        v = (v - mi) / ((ma - mi) if ma != mi else 1e5)
    return cmap(v)[..., :3].transpose(2, 0, 1)


def sec_to_hm_str(t: float) -> str:
    t = int(t)
    s, t = t % 60, t // 60
    m, h = t % 60, t // 60
    return f"{h:02d}h{m:02d}m{s:02d}s"


class MetricsLogger:
    """Tensorboard (train/val writers) + terminal logger, rank-0 only."""

    def __init__(self, log_path: str, rank: int = 0,
                 batch_size: int = 12, num_total_steps: int = 1):
        self.rank = rank
        self.batch_size = batch_size
        self.num_total_steps = max(1, num_total_steps)
        self.start_time = time.time()
        self.writers: Dict[str, object] = {}
        self._jsonl = None
        if rank != 0:
            return
        os.makedirs(log_path, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            for mode in ("train", "val"):
                self.writers[mode] = SummaryWriter(
                    os.path.join(log_path, mode))
        except Exception:
            self._jsonl = open(os.path.join(log_path, "metrics.jsonl"), "a")

    def log_time(self, epoch: int, batch_idx: int, step: int,
                 duration: float, loss: float):
        """examples/s + ETA (reference: trainer.py:759-770)."""
        if self.rank != 0:
            return
        sps = self.batch_size / max(duration, 1e-9)
        elapsed = time.time() - self.start_time
        left = ((self.num_total_steps / max(step, 1) - 1.0) * elapsed
                if step > 0 else 0)
        print(f"epoch {epoch:>3} | batch {batch_idx:>6} | "
              f"examples/s: {sps:5.1f} | loss: {loss:.5f} | "
              f"time elapsed: {sec_to_hm_str(elapsed)} | "
              f"time left: {sec_to_hm_str(left)}", flush=True)

    def log_scalars(self, mode: str, losses: Dict, step: int):
        if self.rank != 0:
            return
        scalars = {k: float(v) for k, v in losses.items()
                   if np.ndim(v) == 0}
        if mode in self.writers:
            for k, v in scalars.items():
                self.writers[mode].add_scalar(k, v, step)
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"mode": mode, "step": step, **scalars}) + "\n")
            self._jsonl.flush()

    def log_images(self, mode: str, batch, outputs, step: int,
                   max_images: int = 4):
        """Input frames, warped predictions, mono/mvs disparity panels
        (reference: trainer.py:772-793)."""
        if self.rank != 0 or mode not in self.writers:
            return
        w = self.writers[mode]
        # local_array: multi-process outputs are data-sharded global
        # arrays; panels show this host's rows (== its loader rows).
        color = local_array(batch["color"])
        n = min(max_images, color.shape[0])
        for j in range(n):
            for fi in range(color.shape[1]):
                w.add_image(f"color_{fi}_0/{j}",
                            color[j, fi].transpose(2, 0, 1), step)
            if "warped" in outputs:
                for f, img in outputs["warped"].items():
                    w.add_image(f"color_pred_{f}_0/{j}",
                                local_array(img)[j].transpose(2, 0, 1), step)
            w.add_image(f"disp_mono/{j}",
                        colormap(local_array(outputs["disp_0"])[j, ..., 0]),
                        step)
            w.add_image(f"disp_mvs/{j}",
                        colormap(1.0 / local_array(outputs["depth_mvs"])[j]),
                        step)

    def close(self):
        for w in self.writers.values():
            w.close()
        if self._jsonl is not None:
            self._jsonl.close()

"""Typed configuration for MoveDepth-TPU.

Mirrors every *live* flag of the reference argparse config
(reference: movedepth/options.py:7-350) as one frozen dataclass, so a config
is hashable and can be closed over by jitted functions. Dead reference flags
(casbins/casfac/casch, mvs_raft, iter_*, v1_multiscale, ...) pair with unused
components and are intentionally omitted; they are documented in SURVEY.md
section 2.2.

Fixes two reference bugs rather than replicating them:
  * the reference's ``train.py`` imports a nonexistent ``MovedepthOptions``
    (reference: movedepth/train.py:5 vs options.py:7) -- here there is a
    single ``Config`` used everywhere;
  * the reference's default ``models_to_load`` contains the malformed entry
    ``"pose, reg3d"`` and omits ``mask_cnn``/``up``
    (reference: movedepth/options.py:251) -- here the default restores every
    model.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Optional, Tuple


ALL_MODELS: Tuple[str, ...] = (
    "mono_encoder",
    "mono_depth",
    "pose_encoder",
    "pose",
    "mvs_encoder",
    "reg3d",
    "mask_cnn",
    "up",
)


@dataclass(frozen=True)
class Config:
    # ---- data (reference: options.py:11-27,64-79) ----
    data_path: str = "kitti_data"
    log_dir: str = "log"
    model_name: str = "mdp"
    split: str = "eigen_zhou"
    dataset: str = "kitti"
    png: bool = False
    height: int = 192
    width: int = 640

    # ---- model architecture (reference: options.py:28-32,123-125,197-212) ----
    res_arch: int = 18  # ResNet depth for mono/pose encoders (18/34/50/101/152)
    weights_init: str = "pretrained"  # "pretrained" | "scratch"
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    prior_scale: int = 2  # scale of the mono disp used as the MVS prior
    reg3d_c: int = 16  # cost-volume group count == reg3d channels
    convex_up: bool = True  # shipped scripts pass --convex_up
    dcn: bool = False  # deformable conv variant (off in shipped config)

    # ---- depth range / cost volume (reference: options.py:33-63,89-118,217-231) ----
    min_depth: float = 0.1
    max_depth: float = 100.0
    num_depth_bins: int = 16
    depth_bin_fac: float = 0.3
    schedule_type: str = "inverse"  # 'inverse' | 'linear' | 'log'
    ztrans_start_epc: int = 8
    z_scale: float = 30.0
    norm_radius: int = 1

    # ---- frames (reference: options.py:97-106,166-173) ----
    frame_ids: Tuple[int, ...] = (0, -1, 1)
    matching_ids: Tuple[int, ...] = (0, -1)

    # ---- optimization (reference: options.py:119-146) ----
    batch_size: int = 12
    learning_rate: float = 1e-4
    lr_fac: float = 1.0  # LR multiplier for the MVS parameter group
    num_epochs: int = 20
    scheduler_step_size: int = 15  # StepLR x0.1 at this epoch
    seed: int = 1

    # ---- losses (reference: options.py:49-60,80-83,150-160,319-341) ----
    ssim_lw: float = 0.85
    disparity_smoothness: float = 1e-3
    mask_lw: float = 10.0  # masked-augmentation consistency weight
    no_ssim: bool = False
    disable_automasking: bool = False
    # mean-over-frames instead of per-pixel min for the mono reprojection
    # (monodepth2 semantics; the reference declares the flag,
    # options.py:150, but its trainer never consumes it)
    avg_reprojection: bool = False
    mask_mvs_conf: bool = False
    mask_mvs_dist: bool = False
    mask_mvs_geo: bool = False
    mask_mvs_auto: bool = False
    mvs_smooth_loss: bool = False
    photo_conf: float = 0.2
    dist_thres: float = 0.0
    pixel_thres: float = 1.0
    depth_thres: float = 0.1

    # ---- pose (reference: options.py:317-318) ----
    load_pose: bool = False  # use precomputed DVSO poses instead of PoseNet

    # ---- system ----
    num_workers: int = 12
    compute_dtype: str = "bfloat16"  # dtype of conv/matmul compute on TPU
    # parameter STORAGE dtype: variables are cast to this at init
    # (bfloat16 halves parameter HBM; compute casts are governed by
    # compute_dtype either way). BN running stats stay float32.
    param_dtype: str = "float32"
    # fused Pallas plane-sweep warp (inference path; auto-disabled off-TPU)
    pallas_warp: bool = True
    # epipolar row-window width of the sweep kernel's fast path (a host-side
    # coverage check falls back through a widening ladder to the exact
    # full-row kernel when the taps of any (row, bin-block) exceed the
    # window); 0 disables windowing. 8 halves the kernel's MXU work vs 16
    # whenever the inter-frame vertical motion is sub-pixel (the KITTI
    # regime); larger motion just takes the next rung.
    sweep_row_window: int = 8
    # epipolar source-COLUMN window of the sweep kernel's narrowest rung:
    # output x runs in chunks whose horizontal taps sit in a disparity
    # band, so the H contraction needs only this many source columns
    # (K drops W -> 128 = one MXU K-tile at the 160-wide prior scale); a
    # host-side coverage check on sx disables it per call when the band
    # overflows. 0 disables. OFF by default: chip A/B measured the
    # windowed rung +11 ms/iter at batch 128 (154.6 -> 165.7 ms
    # whole-model; the chunked H blocks defeat the kernel's stacked-bin
    # concatenation -- PROFILE.md, session of 2026-08-18)
    sweep_col_window: int = 0
    # epipolar source-COLUMN window of the full-res photometric image
    # warp (ops/pallas/image_warp.py): output columns run in chunks whose
    # horizontal taps sit in a disparity band, dropping the contraction K
    # from W to this window; a host-side coverage check falls back to the
    # full-row rung per call when the band overflows. 0 disables
    warp_col_window: int = 384
    # C++ decode+pyramid loader (native/loader.cpp): decode + float
    # Lanczos pyramid + fused color jitter, one GIL-free OS thread per
    # image -- measured 90-99 img/s/core vs PIL's 76-81 (47.4 vs 45.1 on
    # the jittered train path; PROFILE.md loader table). Default ON; the
    # dataset falls back to PIL automatically when the toolchain cannot
    # build the .so (data/kitti.py), and robust_train's random frame
    # offsets still take the PIL path
    native_loader: bool = True
    # photometric losses on the folded-planar layout (ops/layout.py):
    # channels packed into sublanes so the SSIM/L1/automask/smoothness
    # chains run lane-dense instead of padding NHWC's C=3 lanes 42x.
    # Same math (float reassociation only); off = the NHWC reference
    # formulation. Default off: chip A/B measured the planar TRAIN step
    # SLOWER (275 vs 264 ms @ batch 8, 810 vs 656 ms @ batch 16) and OOM
    # at batch 24 no-remat -- XLA fuses the NHWC chain into the warp
    # epilogue anyway and the fold adds real reshape traffic
    # (PROFILE.md 2026-08-19). Kept as a tested option
    planar_losses: bool = False
    # compute the photometric L1 map inside the image-warp Pallas kernel's
    # epilogue (ops/pallas/image_warp.py, ``target=``): the per-frame
    # warped stack never round-trips HBM for the L1 tail, and the L1
    # cotangent folds into the same coordinate-VJP launch. Identical math
    # to the XLA tail (cast-then-sum parity). NHWC-path only; A/B via
    # scripts/profile_planar_ab.py AB_FIELD=kernel_l1
    kernel_l1: bool = False
    # subpixel-fold decoder stage 2 as well (models/depth_decoder.py
    # fold_stage2): upconv_2_1 runs at 1/8 res with 256 output lanes
    # instead of 64 at 1/4, and the stage-1 merged conv consumes the
    # phase representation. Same function/params (parity-tested); default
    # off pending a chip A/B
    fold_stage2: bool = False
    # train batches per chip ABOVE this rematerialize the encoders, the MVS
    # trunk and the photometric frame blocks (jax.checkpoint) so batch 32
    # fits the 16 GB HBM; at/below it, full-speed (no recompute). With the
    # folded-planar checkpoint boundary (pipeline.py) the no-remat
    # footprint at the shipped 640x192 measured 2026-08-19 is 14.81 GB at
    # batch 24 (fits; 1310 ms vs 2084 ms under remat -- the remat graph
    # hits an XLA scheduling pathology at this batch, PROFILE.md) and OOM
    # at batch 32, so 24 is the largest full-speed batch. Static at trace
    # time.
    remat_batch_threshold: int = 24
    # train steps executed per device dispatch (an on-device lax.scan of
    # the REAL step; semantics = that many sequential steps). Chip-A/B'd
    # and NOT a single-chip win: with real per-step batches the scanned
    # step measured 953.2 ms at batch 16 (K=4) vs ~701 ms for the
    # production single-step dispatch -- the earlier harness-scan speedup
    # existed only because its batch was loop-constant (PROFILE.md round
    # 4, "Shipped multistep"). Default stays 1; >1 is for deployments
    # where per-step host dispatch latency dominates (it is ~zero on this
    # tunnel). Train-image logging is recomputed out of band at log
    # events.
    steps_per_dispatch: int = 1
    # XLA scoped-VMEM budget (KiB) for the train-step jit, 0 = compiler
    # default. The round-5 flag sweep (scripts/xla_sweep.py,
    # artifacts/xla_sweep.json) found the default budget mis-scheduling
    # the large-batch step: 32768 is neutral at batch 8 and 1.44x at
    # batch 16 (485.6 vs 701.5 ms = 33.0 ex/s/chip) / 1.35x at batch 24
    # on chip; >= 49152 OOM-kills the compile helper. TPU-only (ignored
    # on other backends)
    scoped_vmem_limit_kib: int = 32768
    # the INFERENCE programs' scoped-VMEM budget -- the optimum is
    # program-specific: the train step wants 32 MiB (40 MiB measured
    # 951.7 ms vs 485.6 at batch 16) while inference keeps improving to
    # a 40-44 MiB plateau (92.55 / 92.45 ms/iter vs 94.20 at 32 MiB =
    # 1383 fps). 40960 leaves margin below the >= 48 MiB compile-helper
    # OOM. Used by bench/evaluate/infer via
    # xla_compiler_options(cfg, infer=True)
    infer_scoped_vmem_limit_kib: int = 40960
    # what the heavy path recomputes: "full" = encoders/poses too,
    # "mvs" = only the cost-volume trunk + photometric frame blocks
    # (faster backward, a few GB more residuals)
    remat_scope: str = "full"
    # robust training: random frame offsets (reference: mono_dataset rt flag)
    robust_train: bool = False
    # which cost-volume axis the mesh 'model' axis shards (tensor
    # parallelism the reference cannot express; no-op when the active
    # mesh has model=1). Audited with scripts/dump_sharded_hlo.py on a
    # virtual (data=4, model=2) mesh, 2026-08-19 (per-step collective
    # traffic of the whole train step; grad all-reduce ~172 MB in all):
    #   "groups" (default): shard the correlation-group (channel) axis.
    #       Least traffic (all-gather 2.4 MB + permute 3.4 MB): GSPMD
    #       re-gathers the per-data-shard volume (0.39 MB each) at
    #       Reg3D's first channel-contracting conv and shards the rest.
    #   "depth": shard the D hypothesis axis -- all-gather 8.3 MB +
    #       permute 6.0 MB; GSPMD un-shards D before Reg3D (conv-spatial
    #       but too small to halo-partition).
    #   "height": spatial H partitioning -- REJECTED: the constraint
    #       propagates through the whole graph (all-gather 126 MB,
    #       permute 19 MB, 832 halo ops).
    #   "none": replicate the volume over the model axis.
    # In every variant the sweep/correlation compute upstream stays fully
    # sharded; the model axis is a capability demonstration at this model
    # size -- DP is the recommended deployment strategy (SURVEY.md 2.4).
    model_shard_axis: str = "groups"

    # ---- loading (reference: options.py:242-251) ----
    load_weights_folder: Optional[str] = None
    mono_weights_folder: Optional[str] = None
    models_to_load: Tuple[str, ...] = ALL_MODELS

    # ---- logging (reference: options.py:254-264) ----
    log_frequency: int = 250
    save_frequency: int = 1
    save_intermediate_models: bool = False

    # ---- evaluation (reference: options.py:267-314) ----
    eval_split: str = "eigen"
    disable_median_scaling: bool = False
    pred_depth_scale_factor: float = 1.0
    post_process: bool = False

    # -------------------------------------------------------------- helpers
    @property
    def num_scales(self) -> int:
        return len(self.scales)

    @property
    def prior_hw(self) -> Tuple[int, int]:
        s = 2 ** self.prior_scale
        return self.height // s, self.width // s

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        """Persist the experiment config (reference: trainer.py:796-805)."""
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        for k in ("scales", "frame_ids", "matching_ids", "models_to_load"):
            if k in d and d[k] is not None:
                d[k] = tuple(d[k])
        return Config(**d)


# Kernel-feature degradation ladder, strongest first. Tier 0 is the full
# fast path; each later tier disables one class of custom-kernel rung whose
# Mosaic compilation could regress with a toolchain change (Mosaic
# rejections are compile-time errors, so the runtime lax.cond coverage
# ladders cannot catch them). The last tier is the pure-XLA formulation.
# bench.py and __graft_entry__ walk this ladder on compile failure.
KERNEL_TIERS: Tuple[Tuple[str, dict], ...] = (
    ("full fast path", {}),
    ("column windows off", {"sweep_col_window": 0, "warp_col_window": 0}),
    ("kernel windows off",
     {"sweep_row_window": 0, "sweep_col_window": 0, "warp_col_window": 0}),
    ("pure XLA", {"pallas_warp": False, "sweep_row_window": 0,
                  "sweep_col_window": 0, "warp_col_window": 0}),
)


def xla_compiler_options(cfg: Config, infer: bool = False) -> Optional[dict]:
    """Per-jit XLA options for the hot programs (train step, inference).

    The round-5 flag sweep (scripts/xla_sweep.py, PROFILE.md) measured
    the default scoped-VMEM budget starving async-copy staging, with a
    program-specific optimum: 32 MiB caps the batch-16 train step 1.44x
    (33.0 ex/s/chip; 40 MiB is 2x WORSE there), while inference peaks at
    40 MiB (92.55 vs 98.44 ms/iter at batch 128 = 1383 fps, +6.4%);
    >= 48 MiB OOM-kills the compile helper. TPU-only; 0 disables.
    """
    import jax

    kib = cfg.infer_scoped_vmem_limit_kib if infer \
        else cfg.scoped_vmem_limit_kib
    if kib and jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}
    return None


def validate(cfg: Config) -> Config:
    """Shape/consistency checks (reference: trainer.py:39-57)."""
    if cfg.height % 32 != 0:
        raise ValueError("height must be a multiple of 32")
    if cfg.width % 32 != 0:
        raise ValueError("width must be a multiple of 32")
    if cfg.frame_ids[0] != 0:
        raise ValueError("frame_ids must start with 0")
    if len(cfg.frame_ids) <= 1:
        raise ValueError("frame_ids must have more than 1 frame")
    if cfg.matching_ids[0] != 0:
        raise ValueError("matching_ids must start with 0")
    if cfg.res_arch not in (18, 34, 50, 101, 152):
        raise ValueError("res_arch must be one of 18/34/50/101/152")
    if cfg.schedule_type not in ("inverse", "linear", "log"):
        raise ValueError("unknown schedule_type")
    return cfg

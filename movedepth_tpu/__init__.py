"""MoveDepth-TPU: a TPU-native (JAX/XLA/Pallas) self-supervised multi-frame
monocular depth estimation framework.

Re-designed from scratch for TPU with the capabilities of MOVEDepth
(reference: JeffWang987/MOVEDepth; arXiv 2208.09170): a monodepth2-style
single-frame depth network provides a prior, a plane-sweep cost volume over
velocity-guided depth candidates refines it into an MVS depth, and a learned
uncertainty head fuses the two. Training is fully self-supervised
(photometric SSIM+L1 min-reprojection with automasking + edge-aware
smoothness).

Design principles (TPU-first, not a port):
  * NHWC layout everywhere; convs lower onto the MXU via XLA.
  * Pure functional ops (no cached buffers); everything jit-able.
  * The plane-sweep warp is a batched gather+lerp (optionally a fused
    Pallas kernel) vmapped over batch and source frames -- no Python loops.
  * Data parallelism via jax.sharding Mesh + XLA collectives, replacing
    the reference's DDP/NCCL; SyncBN == BatchNorm with a mesh axis_name.
"""

__version__ = "0.1.0"

from movedepth_tpu.ops.geometry import (
    disp_to_depth,
    rot_from_axisangle,
    get_translation_matrix,
    transformation_from_parameters,
    pixel_grid,
    backproject,
    project,
)
from movedepth_tpu.ops.sampling import (
    grid_sample,
    resize_bilinear,
    upsample_nearest_2x,
)
from movedepth_tpu.ops.losses import (
    ssim,
    reprojection_loss,
    smooth_loss,
    smooth_l1_loss,
    entropy,
)
from movedepth_tpu.ops.metrics import compute_depth_errors
from movedepth_tpu.ops.costvolume import (
    schedule_depth_bins,
    schedule_depth_bins_z,
    plane_sweep_costvol,
    reduce_cost_groups,
    localmax,
)
from movedepth_tpu.ops.upsample import convex_upsample
from movedepth_tpu.ops.masking import random_image_mask, geometric_consistency_mask

"""Pure array ops (NHWC, jit-friendly, no Python state).

Every op here is a pure function over jnp arrays with static shapes, designed
to fuse under XLA. Reference behaviors they reproduce are cited per-function
(file:line into /root/reference).
"""

from dkt_stereo_tpu.ops.pad import pad_dims, pad_input, unpad_input
from dkt_stereo_tpu.ops.sampler import (
    bilinear_sampler,
    coords_grid_x,
    sample_row_1d,
)
from dkt_stereo_tpu.ops.resize import (
    avg_pool2d,
    interp_bilinear_align,
    pool2x,
    upflow,
)
from dkt_stereo_tpu.ops.corr import (
    corr_lookup,
    corr_pyramid,
    corr_volume,
)
from dkt_stereo_tpu.ops.upsample import convex_upsample, context_upsample
from dkt_stereo_tpu.ops.volumes import (
    build_concat_volume,
    build_gwc_volume,
    build_norm_correlation_volume,
    disparity_regression,
    regression_topk,
)
from dkt_stereo_tpu.ops.warp import disp_warp, ssim
from dkt_stereo_tpu.ops.misc import forward_interpolate, gauss_blur

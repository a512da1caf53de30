from .bilinear import bilinear_pool, cross_bilinear_pool
from .cbp import compact_bilinear_pool, make_sketch_matrix
from .isqrt import covariance_pool, mpn_cov_pool, newton_schulz_sqrt, triu_vec
from .nms import anchor_adjacency, iou_matrix, nms_fixed_anchors_batch, nms_general
from .peaks import peak_mask, peak_stimulation
from .resample import (
    crop_resize_bilinear,
    crop_resize_multibox,
    grid_sample_bilinear,
    resize_bilinear,
)

__all__ = [
    "bilinear_pool",
    "cross_bilinear_pool",
    "compact_bilinear_pool",
    "make_sketch_matrix",
    "covariance_pool",
    "mpn_cov_pool",
    "newton_schulz_sqrt",
    "triu_vec",
    "crop_resize_bilinear",
    "grid_sample_bilinear",
    "resize_bilinear",
]

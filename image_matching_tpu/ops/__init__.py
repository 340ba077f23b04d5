from image_matching_tpu.ops.nms import simple_nms, max_pool_2d
from image_matching_tpu.ops.detect import detect_keypoints
from image_matching_tpu.ops.sampling import (
    sample_descriptors,
    extract_patches,
    soft_argmax_2d,
    refine_keypoints_subpixel,
)
from image_matching_tpu.ops.matching import (
    match_ratio_mutual,
    match_mutual_nn,
    match_hamming,
    pairwise_sqdist,
)
from image_matching_tpu.ops.ransac import (
    ransac_similarity,
    ransac_homography,
    fit_similarity_lsq,
)
from image_matching_tpu.ops.sinkhorn import (
    log_optimal_transport,
    log_sinkhorn,
)

__all__ = [
    "simple_nms",
    "max_pool_2d",
    "detect_keypoints",
    "sample_descriptors",
    "extract_patches",
    "soft_argmax_2d",
    "refine_keypoints_subpixel",
    "match_ratio_mutual",
    "match_mutual_nn",
    "match_hamming",
    "pairwise_sqdist",
    "ransac_similarity",
    "ransac_homography",
    "fit_similarity_lsq",
    "log_optimal_transport",
    "log_sinkhorn",
]

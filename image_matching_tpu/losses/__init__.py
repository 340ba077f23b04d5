from image_matching_tpu.losses.detector import detector_loss, cell_mask_from_2d
from image_matching_tpu.losses.descriptor import (
    sparse_descriptor_loss,
    homography_to_cell_frame,
)
from image_matching_tpu.losses.superglue_loss import superglue_nll_loss, make_gt_matches

__all__ = [
    "detector_loss",
    "cell_mask_from_2d",
    "sparse_descriptor_loss",
    "homography_to_cell_frame",
    "superglue_nll_loss",
    "make_gt_matches",
]

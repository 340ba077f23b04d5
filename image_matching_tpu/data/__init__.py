from image_matching_tpu.data.photometric import PhotometricConfig, photometric_augment
from image_matching_tpu.data.datasets import (
    ALLSSDataset,
    SSHIDataset,
    SyntheticShapesDataset,
    get_dataset,
)
from image_matching_tpu.data.pipeline import (
    WarpedPairConfig,
    make_warped_pair_batch,
)

__all__ = [
    "PhotometricConfig",
    "photometric_augment",
    "ALLSSDataset",
    "SSHIDataset",
    "SyntheticShapesDataset",
    "get_dataset",
    "WarpedPairConfig",
    "make_warped_pair_batch",
]

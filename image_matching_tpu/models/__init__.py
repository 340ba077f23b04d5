from image_matching_tpu.models.superpoint import (
    SuperPointBN,
    SuperPointVGG,
    superpoint_postprocess,
)
from image_matching_tpu.models.superglue import SuperGlue, normalize_keypoints
from image_matching_tpu.models.matching import Matching, MatchingConfig

MODEL_REGISTRY = {
    "superpoint_bn": SuperPointBN,
    "superpoint_vgg": SuperPointVGG,
    "superglue": SuperGlue,
}


def get_model(name: str, **kwargs):
    """Name → model instance, the reflection registry the reference keeps at
    utils/utils.py:51-53 / datasets/__init__.py:1-7."""
    return MODEL_REGISTRY[name](**kwargs)


__all__ = [
    "SuperPointBN",
    "SuperPointVGG",
    "SuperGlue",
    "Matching",
    "MatchingConfig",
    "superpoint_postprocess",
    "normalize_keypoints",
    "get_model",
    "MODEL_REGISTRY",
]

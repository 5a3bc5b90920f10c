"""TPU compute primitives: patch extraction + the fused flash-score kernel."""

from .flash_score import flash_score_update, state_from_pallas, state_to_pallas
from .patches import center_index, extract_patches, pad_image, patch_centers

__all__ = [
    "flash_score_update",
    "state_to_pallas",
    "state_from_pallas",
    "extract_patches",
    "pad_image",
    "patch_centers",
    "center_index",
]

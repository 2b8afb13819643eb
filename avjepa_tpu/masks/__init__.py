from avjepa_tpu.masks.multiblock3d import (
    AVMaskCollator,
    MaskCollator,
    MaskSet,
    RandomTubeCollator,
)

__all__ = ["AVMaskCollator", "MaskCollator", "MaskSet", "RandomTubeCollator"]

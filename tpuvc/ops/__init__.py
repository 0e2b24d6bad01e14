from tpuvc.ops.pad import pad_to_multiple, unpad
from tpuvc.ops.warp import warp
from tpuvc.ops.resample import (
    avg_pool2d,
    bilinear_resize,
    upsample2x_flow,
    pixel_shuffle,
    pixel_unshuffle,
)

__all__ = [
    "pad_to_multiple",
    "unpad",
    "warp",
    "avg_pool2d",
    "bilinear_resize",
    "upsample2x_flow",
    "pixel_shuffle",
    "pixel_unshuffle",
]

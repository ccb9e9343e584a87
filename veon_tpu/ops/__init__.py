from .bev_pool import bev_pool, bev_pool_points
from .grid_sample import grid_sample_2d, grid_sample_3d
from .resize import resize_bilinear, resize_bicubic, resize_nearest, adaptive_max_pool2d

__all__ = [
    "bev_pool",
    "bev_pool_points",
    "grid_sample_2d",
    "grid_sample_3d",
    "resize_bilinear",
    "resize_bicubic",
    "resize_nearest",
    "adaptive_max_pool2d",
]

from .lss import (
    LSSLift,
    two_hot_depth,
    one_hot_depth,
    min_pool_depth,
    depth_bins_one_hot_gt,
)

__all__ = [
    "LSSLift",
    "two_hot_depth",
    "one_hot_depth",
    "min_pool_depth",
    "depth_bins_one_hot_gt",
]

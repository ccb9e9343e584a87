from .base import (
    GridConfig,
    SANConfig,
    HSAConfig,
    PropagationConfig,
    DepthConfig,
    LossConfig,
    DataConfig,
    VeonConfig,
)
from . import presets

__all__ = [
    "GridConfig",
    "SANConfig",
    "HSAConfig",
    "PropagationConfig",
    "DepthConfig",
    "LossConfig",
    "DataConfig",
    "VeonConfig",
    "presets",
]

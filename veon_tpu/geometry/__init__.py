from .frustum import (
    create_frustum,
    frustum_to_ego,
    voxel_ranks,
    sensor2keyego_chain,
)

__all__ = [
    "create_frustum",
    "frustum_to_ego",
    "voxel_ranks",
    "sensor2keyego_chain",
]

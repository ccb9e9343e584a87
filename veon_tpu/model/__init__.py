from .veon import VeonModel, VeonOutputs, fusion_rule

__all__ = ["VeonModel", "VeonOutputs", "fusion_rule"]

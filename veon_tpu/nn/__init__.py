from . import layers, attention, vit, dpt, san, hsa, alignnet, text

__all__ = ["layers", "attention", "vit", "dpt", "san", "hsa", "alignnet", "text"]

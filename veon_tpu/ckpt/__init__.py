from . import convert, io

__all__ = ["convert", "io"]

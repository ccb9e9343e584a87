from .client import TensorClient
from .server import TensorServer, serve_exported
from .streaming import TemporalSession

__all__ = ["TensorClient", "TensorServer", "serve_exported",
           "TemporalSession"]

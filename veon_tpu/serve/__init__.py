from .client import TensorClient
from .server import TensorServer, serve_exported

__all__ = ["TensorClient", "TensorServer", "serve_exported"]

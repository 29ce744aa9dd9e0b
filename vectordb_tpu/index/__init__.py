from .graph import GraphIndex

__all__ = ["GraphIndex"]

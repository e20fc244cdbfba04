from .cc import connected_components, symmetrize

__all__ = ["connected_components", "symmetrize"]

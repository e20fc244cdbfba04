from .cc import connected_components, symmetrize
from .labelprop import label_propagation
from .pagerank import pagerank
from .sssp import sssp
from .triangles import triangle_count, triangle_count_per_vertex, triangles_df

__all__ = [
    "connected_components",
    "symmetrize",
    "label_propagation",
    "pagerank",
    "sssp",
    "triangle_count",
    "triangle_count_per_vertex",
    "triangles_df",
]

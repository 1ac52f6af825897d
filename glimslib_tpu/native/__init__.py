from glimslib_tpu.native.meshops import (
    available,
    build,
    cell_adjacency,
    facets,
    partition_graph,
    rcm_permutation,
)

__all__ = [
    "available",
    "build",
    "facets",
    "cell_adjacency",
    "partition_graph",
    "rcm_permutation",
]

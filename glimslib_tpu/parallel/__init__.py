from glimslib_tpu.parallel.partition import CellPartition, partition_cells
from glimslib_tpu.parallel.shard import ShardedP1Kernels, make_device_mesh

__all__ = [
    "CellPartition",
    "partition_cells",
    "ShardedP1Kernels",
    "make_device_mesh",
]

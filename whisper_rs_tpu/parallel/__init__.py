from .mesh import DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh, replicated
from .sharding import batch_sharding, param_shardings, shard_params
from .distributed import initialize_multihost

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "data_sharding",
    "initialize_multihost",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_params",
]

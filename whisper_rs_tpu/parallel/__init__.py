from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    STAGE_AXIS,
    data_sharding,
    make_mesh,
    replicated,
)
from .sharding import batch_sharding, param_shardings, shard_params
from .distributed import initialize_multihost
from .pipeline import encoder_forward_pp, make_pipeline_mesh, pp_encoder_fn
from .ulysses import encoder_forward_ulysses, ulysses_encoder_fn

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "STAGE_AXIS",
    "batch_sharding",
    "data_sharding",
    "encoder_forward_pp",
    "encoder_forward_ulysses",
    "initialize_multihost",
    "make_mesh",
    "make_pipeline_mesh",
    "param_shardings",
    "pp_encoder_fn",
    "replicated",
    "shard_params",
    "ulysses_encoder_fn",
]

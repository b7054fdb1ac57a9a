from .mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, shard_params,
    shard_batch, pad_batch_to_multiple, DATA_AXIS, MODEL_AXIS,
)
from . import multihost  # noqa: F401

from .collectives import row_parallel_matmul, sharded_absmax, sharded_xtx  # noqa: F401
from . import launch  # noqa: F401
from .sharding import (  # noqa: F401
    batch_pspec, cache_pspec, make_mesh, params_pspecs, shard_model, shard_params,
)

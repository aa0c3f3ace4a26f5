from .sharding import (  # noqa: F401
    batch_pspec, cache_pspec, make_mesh, params_pspecs, shard_params,
)

from .mesh import (  # noqa: F401
    data_sharding,
    kv_cache_shardings,
    make_mesh,
    param_shardings,
    seq_constraint,
    shard_params,
    xa_kv_shardings,
)

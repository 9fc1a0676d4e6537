from butterfly_tpu.parallel.sharding import (
    data_sharding,
    make_mesh,
    replicated,
    shard_butterfly,
    shard_table,
)

__all__ = [
    "data_sharding",
    "make_mesh",
    "replicated",
    "shard_butterfly",
    "shard_table",
]

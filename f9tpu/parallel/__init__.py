from .mesh import Mesh, NamedSharding, P, files_sharding, make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    channels_shardable,
    process_batch_channels_sharded,
    process_files_sharded,
    required_frames_padding,
    resample_frames_sharded,
    shard_halos,
)

from .mesh import Mesh, NamedSharding, P, files_sharding, make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    process_files_sharded,
    required_frames_padding,
    resample_frames_sharded,
    shard_halos,
)

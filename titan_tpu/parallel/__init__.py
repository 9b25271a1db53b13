from .batched import (  # noqa: F401
    BatchedScenes, build_batched_step, make_batched_state, shard_batched_state,
)
from .sharded import build_sharded_chunk, shard_state  # noqa: F401
from .halo import build_halo_chunk, halo_supported, place  # noqa: F401
from .halo_tiled import (  # noqa: F401
    build_halo_tiled_chunk, halo_tiled_supported,
)
from .mesh import make_mesh  # noqa: F401
from . import multihost  # noqa: F401
from .flat import replicate_scene, set_env_gravity, set_env_plane  # noqa: F401

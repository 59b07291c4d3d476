from .mesh import (  # noqa: F401
    make_mesh, batch_sharding, frames_sharding, replicated,
    initialize_distributed,
)
from .sharded_ops import make_sharded_ssw, make_sharded_transport  # noqa: F401

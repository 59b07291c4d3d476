from .mesh import (  # noqa: F401
    make_mesh, batch_sharding, frames_sharding, replicated,
    initialize_distributed,
)
from .sharded_ops import make_sharded_ssw, make_sharded_transport  # noqa: F401
from .dist_sort import (  # noqa: F401
    make_points_mesh, dist_sort, dist_cumsum, dist_emd1d,
    dist_emd1d_circle, make_dist_ssw,
)

"""Pure-math kernels (quaternions, costs, OT, slicing, Chamfer, geometry)."""

from .quaternion import (  # noqa: F401
    qmul, qrot, euler_to_quaternion, quat_to_matrix,
    create_pose_7d, pose_quaternion, pose_translation,
    quaternion_rotate, quaternion_transform, convert2transformation,
    rotation_error_deg, translation_error,
)
from .costs import (  # noqa: F401
    lp_cost, cosine_cost, geodesic_cost, sqeuclidean_cost,
    cosine_similarity, cost_matrix,
)
from .ot1d import (  # noqa: F401
    emd1d, emd1d_general, emd1d_circle, circle_ot, batched_searchsorted,
)
from .sinkhorn import sinkhorn_log, emd2_approx, sinkhorn_loss  # noqa: F401
from .sinkhorn_pallas import (  # noqa: F401
    emd2_points, fused_supported, sinkhorn_points,
)
from .chamfer import chamfer, chamfer_directional, chamfer_pallas  # noqa: F401
from .spherical import (  # noqa: F401
    stiefel_frames, project_to_circle, sliced_cost_sphere,
    sliced_wasserstein_sphere,
)
from .sphere_sampling import (  # noqa: F401
    sample_cube_surface, sample_ellipsoid_surface, sample_sphere_surface,
)

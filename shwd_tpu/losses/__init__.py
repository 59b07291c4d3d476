"""Loss families: adversarial SHWD, pseudo-ensemble, max-SSW, baselines, zoo."""

from .transport import TransportConfig, make_transport  # noqa: F401
from .shwd import SHWDConfig, SHWDState, SHWDLoss, sphere_regularizer  # noqa: F401
from .pseudo import PseudoSHWDConfig, PseudoSHWDState, PseudoSHWDLoss  # noqa: F401
from .ssw_loss import MaxSSWConfig, MaxSSWState, MaxSSWLoss  # noqa: F401
from .baselines import chamfer_criterion, make_sinkhorn_criterion  # noqa: F401
from .sliced_zoo import (  # noqa: F401
    rand_projections, sliced_wasserstein_distance,
    max_sliced_wasserstein_distance, gswd_polynomial, max_gswd_polynomial,
    gswd_polynomial3_2d, gswd_circular, max_gswd_circular,
    augmented_sliced_wasserstein_distance, init_mapping,
    distributional_sliced_wasserstein_distance, init_transform_net,
    gsw_nn, max_gsw_nn, init_gsw_mlp, adversarial_maximize,
)

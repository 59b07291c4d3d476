"""Functional normalizing-flow library (the phi of SHWD)."""

from .base import Flow, FlowChain  # noqa: F401
from .planar import PlanarFlow  # noqa: F401
from .lipschitz import (  # noqa: F401
    LipschitzMLP, spectral_linear_init, spectral_linear_apply,
    spectral_linear_power_iter, swish,
)
from .residual import ResidualFlow, make_residual_chain  # noqa: F401
from .actnorm import ActNorm  # noqa: F401
from .chart import SphereChartMLP, EncoderFlowChart  # noqa: F401


def make_flow(flow_name: str = "Residual", n_flow_layers: int = 3,
              dim: int = 3, hidden_units: int = 8, hidden_layers: int = 7,
              lipschitz_const: float = 0.95) -> FlowChain:
    """The reference's ``Norm_Flow_structure`` factory
    (s2_wasserstein.py:134-163): 'Planar' chains planar flows; 'Residual'
    chains invertible residual blocks over LipschitzMLPs [d, 8 x 6, d].
    ``Norm_Flow_structure_optuna`` (:171-201) is the same with parameterized
    hidden_units/hidden_layers — covered by the kwargs.
    """
    if flow_name == "Planar":
        return FlowChain([PlanarFlow(dim) for _ in range(n_flow_layers)])
    if flow_name == "Residual":
        return make_residual_chain(n_flow_layers, dim, hidden_units,
                                   hidden_layers, lipschitz_const)
    raise ValueError(f"Flow name is not valid: {flow_name!r}")

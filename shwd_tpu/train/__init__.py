from .config import TrainConfig, config_from_dict  # noqa: F401
from .flow_driver import FlowConfig, FlowResult, run_flow  # noqa: F401
from .pose_refine import (  # noqa: F401
    PoseRefineConfig, PoseRefineResult, refine_model_output, refine_poses,
)
from .trainer import Trainer, TrainState, build_criterion  # noqa: F401

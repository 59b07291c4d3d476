from .logging import RunLogger  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from .optim import torch_adam  # noqa: F401

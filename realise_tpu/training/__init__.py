from realise_tpu.training.optim import make_optimizer  # noqa: F401
from realise_tpu.training.trainer import TrainState, Trainer  # noqa: F401

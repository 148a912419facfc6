from emg_tpu.train.state import TrainState, create_train_state, warmup_lr, make_optimizer  # noqa: F401
from emg_tpu.train.trainer import Trainer, merge_params  # noqa: F401
from emg_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from emg_tpu.train.metrics_writer import MetricsWriter, default_log_dir  # noqa: F401

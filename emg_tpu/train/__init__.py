from emg_tpu.train.state import TrainState, create_train_state, warmup_lr, make_optimizer  # noqa: F401
from emg_tpu.train.metrics_writer import MetricsWriter, default_log_dir  # noqa: F401


def __getattr__(name):
    # lazy to avoid a circular import (trainer -> parallel.train_step ->
    # train.state -> this package)
    if name in ("Trainer", "merge_params"):
        from emg_tpu.train import trainer as _t

        return getattr(_t, name)
    if name == "CheckpointManager":
        from emg_tpu.train.checkpoint import CheckpointManager

        return CheckpointManager
    raise AttributeError(name)

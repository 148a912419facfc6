from emg_tpu.ops.ctc import ctc_loss  # noqa: F401
from emg_tpu.ops.losses import label_smoothing_loss, combined_loss  # noqa: F401

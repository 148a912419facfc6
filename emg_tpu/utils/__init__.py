from emg_tpu.utils.audio import splice_audio  # noqa: F401
from emg_tpu.utils.confusion import confusion_matrix, print_confusion  # noqa: F401
from emg_tpu.utils.profiling import profile_trace, annotate  # noqa: F401

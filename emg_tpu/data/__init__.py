from emg_tpu.data.dataset import EMGDataset, EMGDirectory, make_normalizers  # noqa: F401
from emg_tpu.data.sampler import DynamicBatchSampler  # noqa: F401
from emg_tpu.data.batching import (  # noqa: F401
    PackedBatch,
    make_packed_batch,
    pack_raw_emg,
    bucket_up,
    PAD_VALUE,
)
from emg_tpu.data.fixtures import make_synthetic_corpus  # noqa: F401

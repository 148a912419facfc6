"""emg_tpu — TPU-native silent-speech (EMG→phoneme) recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ChristianSquadro/EMG-based-Speech-Recognition-with-heterogenous-data:

- DSP front-end (notch-harmonic/high-pass filtering, resampling, time-domain
  EMG featurization, mel spectrograms) as jit-compiled JAX/Pallas kernels.
- ResBlock CNN subsampler + transformer encoder-decoder with learned relative
  positional attention, trained with joint CTC + label-smoothed CE loss.
- Device-resident greedy decoding and lexicon-constrained beam search over a
  table-compiled phone prefix tree, with an ARPA n-gram language model scorer
  (native C++ with a ctypes binding).
- pjit/shard_map data/tensor parallelism over a jax.sharding.Mesh.

Layer map mirrors the reference (see SURVEY.md §1):
  L2 data pipeline  -> emg_tpu.dsp, emg_tpu.data
  L3 model/losses   -> emg_tpu.models, emg_tpu.ops
  L4 decoding       -> emg_tpu.decode
  L5 CLI/trainer    -> emg_tpu.train, emg_tpu.cli
"""

__version__ = "0.1.0"

from emg_tpu.config import Config  # noqa: F401

from emg_tpu.decode.greedy import greedy_decode, greedy_decode_cached, run_greedy  # noqa: F401
from emg_tpu.decode.prefix_tree import PrefixTree, CompiledTree, init_tree  # noqa: F401
from emg_tpu.decode.ngram import ArpaLanguageModel, load_language_model, write_fixture_arpa  # noqa: F401
from emg_tpu.decode.beam import BeamSearcher, run_single_bs  # noqa: F401

from emg_tpu.decode.device_beam import DeviceBeamSearcher  # noqa: F401
from emg_tpu.decode.continuous import ContinuousBeamServer  # noqa: F401

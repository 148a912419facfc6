from emg_tpu.text.phonemes import (  # noqa: F401
    PHONEME_INVENTORY,
    PAD_ID,
    START_ID,
    END_ID,
    BLANK_ID,
    PhoneTransform,
    TextTransform,
)
from emg_tpu.text.lexicon import Phone, Word, Dictionary, load_pronunciation_dict  # noqa: F401
from emg_tpu.text.normalize import read_phonemes  # noqa: F401
from emg_tpu.text.metrics import wer, edit_distance  # noqa: F401

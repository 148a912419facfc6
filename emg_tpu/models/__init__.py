from emg_tpu.models.model import EMGModel, NUM_OUTS_DEC, NUM_OUTS_ENC  # noqa: F401
from emg_tpu.models.attention import MultiHeadAttention, relative_to_absolute  # noqa: F401
from emg_tpu.models.transformer import TransformerEncoder, TransformerDecoder  # noqa: F401
from emg_tpu.models.resnet import ConvStack, ResBlock, MaskedBatchNorm  # noqa: F401
from emg_tpu.models.positional import PositionalEncoding  # noqa: F401
from emg_tpu.models.conformer import ConformerEncoder  # noqa: F401

from .common import RefLayerNorm, act_fun  # noqa: F401
from .mlp import MLP
from .recurrent import GRU, LSTM, RNN, liGRU, minimalGRU
from .cnn import CNN, SincNet, channel_averaging, logMelFb
from .cudnn_like import GRU_cudnn, LSTM_cudnn, RNN_cudnn
from .fusion import FusionLinear, fusionRNN, fusionRNN_jit
from .quaternion import QLSTM, QuaternionDense
from .sru import SRU
from .pase import PASE
from .registry import register, registered, resolve  # noqa: F401

for _cls in (
    MLP, LSTM, GRU, liGRU, minimalGRU, RNN,
    CNN, SincNet, logMelFb, channel_averaging,
    LSTM_cudnn, GRU_cudnn, RNN_cudnn,
    fusionRNN, QLSTM, SRU, PASE,
):
    register(_cls)
register(fusionRNN_jit, name="fusionRNN_jit")

__all__ = [
    "MLP", "LSTM", "GRU", "liGRU", "minimalGRU", "RNN",
    "CNN", "SincNet", "logMelFb", "channel_averaging",
    "LSTM_cudnn", "GRU_cudnn", "RNN_cudnn",
    "fusionRNN", "fusionRNN_jit", "FusionLinear",
    "QLSTM", "QuaternionDense", "SRU", "PASE",
    "act_fun", "RefLayerNorm", "register", "registered", "resolve",
]

from .common import RefLayerNorm, act_fun  # noqa: F401
from .mlp import MLP
from .recurrent import GRU, LSTM, RNN, liGRU, minimalGRU
from .registry import register, registered, resolve  # noqa: F401

for _cls in (MLP, LSTM, GRU, liGRU, minimalGRU, RNN):
    register(_cls)

__all__ = [
    "MLP",
    "LSTM",
    "GRU",
    "liGRU",
    "minimalGRU",
    "RNN",
    "act_fun",
    "RefLayerNorm",
    "register",
    "registered",
    "resolve",
]

from .nn import (
    NormDense,
    NormConv2d,
    L2NormConv2d,
    LayerNormConv2d,
    Downsample,
    Upsample,
    VunetRNB,
    FullyConnectedNet,
    space_to_depth,
    depth_to_space,
)
from .recurrent import LSTMCell, GRUCell, LSTM

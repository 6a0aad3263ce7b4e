from .blocks import (
    COUPLING_TYPES,
    ActNorm,
    DoubleCoupling,
    Shuffle,
    CouplingFlowBlock,
    UnconditionalFlow,
)
from .conditional import (
    ConditionalCoupling,
    ConditionalFlow,
    ConditionalFlowBlock,
    InvLeakyRelu,
)
from .made import ARFullyConnectedNet, MaskedDense
from .spline import RQSCoupling, rational_quadratic_spline
from .transformer import LatentFlow, flow_loss, gaussian_reference_nll

COUPLING_TYPES["rqs"] = RQSCoupling
from .concat import ConditionalTransformer, DenseEmbedder, Embedder

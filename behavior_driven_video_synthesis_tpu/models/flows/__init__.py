from .blocks import (
    ActNorm,
    DoubleCoupling,
    Shuffle,
    CouplingFlowBlock,
    UnconditionalFlow,
)
from .transformer import LatentFlow, flow_loss, gaussian_reference_nll

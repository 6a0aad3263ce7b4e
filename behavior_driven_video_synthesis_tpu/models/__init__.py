from .behavior import BehaviorEncoder, ResidualDecoder, ResidualBehaviorNet
from .probes import (
    Classifier,
    ClassifierAction,
    ClassifierActionBeta,
    Regressor,
    RegressorFly,
    FCResnet,
)
from .rim import RIM, RIMCell, GroupDense, GroupLSTMCell, GroupGRUCell
from .mtvae import MTVAE

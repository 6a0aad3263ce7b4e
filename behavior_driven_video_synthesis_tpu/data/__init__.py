from .synthetic import SyntheticSequenceDataset
from .base import BaseDataset
from .human36m import (
    Human36mDataset,
    ACTION_ID_TO_ACTION,
    small_joint_model,
    detailed_joint_model,
)
from .samplers import (
    SequenceSampler,
    PerPersonSampler,
    ReconstructionSampler,
    RandomSampler,
    WeightedDataSampler,
    EntireSequenceSampler,
)
from .loader import Loader, collate


def get_dataset(data_config):
    """Dataset registry keyed by the config's ``dataset`` field
    (reference data/__init__.py:46-53)."""
    name = data_config["dataset"].lower()
    if name in ("human3.6m", "human36m", "h36m"):
        return Human36mDataset
    if name == "deepfashion":
        from .deepfashion import DeepFashionDataset
        return DeepFashionDataset
    if name in ("market", "market1501"):
        from .market import MarketDataset
        return MarketDataset
    raise ValueError(f"unknown dataset: {data_config['dataset']}")

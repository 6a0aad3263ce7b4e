from .synthetic import SyntheticSequenceDataset

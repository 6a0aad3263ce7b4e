from .config import (
    Config,
    load_config,
    loads_config,
    save_config,
    deep_merge,
)
from .rng import KeySeq
from . import schedules

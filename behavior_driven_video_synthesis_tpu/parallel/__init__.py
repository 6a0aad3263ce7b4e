from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    replicated_sharding,
)
from .sharding_rules import (
    infer_fsdp_shardings,
    infer_param_shardings,
    place_with_shardings,
    shard_module_state,
    shard_module_state_fsdp,
    state_shardings,
)

from everyvoice_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    NODE_AXIS,
    batch_sharding,
    compress_for_transfer,
    init_distributed,
    make_mesh,
    pad_batch_to_devices,
    replicate_tree,
    replicated,
    resolve_devices,
    setup_mesh,
    shard_batch,
    shard_stacked_batch,
    stack_batches,
)
from everyvoice_tpu.parallel.sharding import (  # noqa: F401
    FS2_PARAM_RULES,
    param_shardings,
    parse_strategy,
    shard_opt_state_like,
    shard_params,
)

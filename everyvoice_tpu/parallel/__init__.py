from everyvoice_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    compress_for_transfer,
    make_mesh,
    pad_batch_to_devices,
    replicate_tree,
    replicated,
    resolve_devices,
    shard_batch,
    shard_stacked_batch,
    stack_batches,
)

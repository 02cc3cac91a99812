"""Compute-precision policy shared by training and serving.

TPU-first mixed precision: conv/matmul compute may run in bfloat16 while
parameters, losses, reductions, and optimizer state stay float32. bf16
shares float32's exponent range, so (unlike fp16) no loss scaling is ever
needed. The reference trains and serves in full 32-bit (its Lightning
trainers never set `precision`); on the MXU, float32 compute runs at less
than half the bf16 rate, so this is a pure-throughput knob.

Kept free of training-loop imports so the serving path (`Synthesizer`)
can resolve its deployment precision without pulling in optimizers or
checkpointing.
"""

from __future__ import annotations


def resolve_compute_dtype(requested: str = "auto", device=None) -> str:
    """Resolve an 'auto'/'float32'/'bfloat16' request to a concrete dtype.

    'auto' resolves to bfloat16 on TPU and to float32 everywhere else, so
    CPU runs (tests, CI) keep exact reference numerics.

    `device` should be a device the computation will actually run on (a
    trainer passes one from its mesh — the mesh may be CPU even when the
    process's default backend is a TPU). When omitted, the configured
    `jax_default_device` wins over the default backend's first device —
    that is where un-annotated computations actually execute (the test
    suite pins it to CPU while the container's primary backend is the TPU).
    """
    if requested != "auto":
        if requested not in ("float32", "bfloat16"):
            raise ValueError(
                f"Unsupported compute dtype {requested!r}: expected 'auto', "
                "'float32', or 'bfloat16' (fp16 would need loss scaling, "
                "which this framework deliberately does not implement)"
            )
        return requested
    import jax

    if device is None:
        device = jax.config.jax_default_device
    if isinstance(device, str):
        # jax.config.update('jax_default_device', 'cpu') / JAX_DEFAULT_DEVICE
        # store a plain platform string rather than a Device object.
        platform = device.split(":")[0]
    else:
        platform = (device or jax.devices()[0]).platform
    return "bfloat16" if platform in ("tpu", "axon") else "float32"


def mesh_device(mesh):
    """First device of a Mesh, or None."""
    try:
        return mesh.devices.flat[0] if mesh is not None else None
    except Exception:
        return None

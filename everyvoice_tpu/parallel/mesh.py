"""Device-mesh parallelism layer.

Replaces the reference's Lightning strategy/devices/nodes triple
(base_cli/interfaces.py:76-98, NCCL DDP underneath) with one
`jax.sharding.Mesh` abstraction: the `data` axis spans ICI within a slice
(and DCN across slices when `nodes > 1`); a reserved `model` axis leaves
room for tensor parallelism even though these models don't need it
(SURVEY.md §2.8). Parameters are replicated, batches sharded over `data`,
and XLA inserts the psum for gradient reduction — no hand-written
collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
NODE_AXIS = "node"


def init_distributed(
    nodes: int,
    node_rank: Optional[int] = None,
    coordinator_address: Optional[str] = None,
) -> bool:
    """Join a multi-process jax runtime when --nodes > 1.

    Each node (host/slice) runs the same CLI command; the coordinator is
    node 0. Rank and coordinator come from flags or the environment
    (EVERYVOICE_NODE_RANK / EVERYVOICE_COORDINATOR_ADDRESS, falling back to
    the conventional NODE_RANK / MASTER_ADDR+MASTER_PORT pair). After this,
    `jax.devices()` is the global device list and collectives ride DCN
    between processes — the reference's Trainer(num_nodes=N) analog
    (base_cli/interfaces.py:76-98) without NCCL/torch.distributed.
    """
    import os

    if nodes <= 1:
        return False
    if node_rank is None:
        node_rank = int(
            os.environ.get(
                "EVERYVOICE_NODE_RANK", os.environ.get("NODE_RANK", "0")
            )
        )
    if coordinator_address is None:
        coordinator_address = os.environ.get(
            "EVERYVOICE_COORDINATOR_ADDRESS"
        ) or "{}:{}".format(
            os.environ.get("MASTER_ADDR", "127.0.0.1"),
            os.environ.get("MASTER_PORT", "12355"),
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=nodes,
        process_id=node_rank,
    )
    return True


def resolve_devices(
    accelerator: str = "auto", devices: str | int = "auto"
) -> list:
    """Map the reference CLI's --accelerator/--devices flags onto jax
    devices. 'auto' prefers any accelerator and falls back to CPU; an
    explicit accelerator that has no devices on this host is an error
    (requesting `-a gpu` must not silently train on whatever is present)."""
    if accelerator == "auto":
        try:
            devs = jax.devices()
        except RuntimeError:
            devs = jax.devices("cpu")
    else:
        try:
            devs = jax.devices(accelerator)
        except RuntimeError as exc:
            available = {d.platform for d in jax.devices()}
            raise RuntimeError(
                f"--accelerator {accelerator} was requested but this host "
                f"has no {accelerator} devices (available platforms: "
                f"{', '.join(sorted(available)) or 'none'}). Use "
                "`--accelerator auto` to take whatever is present."
            ) from exc
    if devices not in ("auto", None):
        devs = devs[: int(devices)]
    return devs


def make_mesh(
    devices: Optional[Sequence] = None,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
    nodes: int = 1,
) -> Mesh:
    """Build a (data, model) mesh — or (node, data, model) when nodes > 1.

    With model_parallel=1 this is pure DP. The node axis is outermost so its
    collectives cross the slow DCN link while data/model collectives stay on
    ICI; `jax.devices()` is already process-major after
    `jax.distributed.initialize`, so a plain reshape puts each node's local
    devices together.
    """
    if devices is None:
        devices = resolve_devices()
    devices = list(devices)
    if data_parallel is None:
        data_parallel = len(devices) // (model_parallel * max(nodes, 1))
    used = devices[: nodes * data_parallel * model_parallel]
    if nodes > 1:
        grid = np.asarray(used).reshape(nodes, data_parallel, model_parallel)
        return Mesh(grid, (NODE_AXIS, DATA_AXIS, MODEL_AXIS))
    grid = np.asarray(used).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def setup_mesh(
    accelerator: str = "auto",
    devices: str | int = "auto",
    nodes: int = 1,
    model_parallel: int = 1,
) -> Mesh:
    """One-stop CLI entry: join the multi-node runtime if requested, then
    build the training mesh over the (global) device list.

    With --nodes, --devices keeps its Lightning meaning of devices *per
    node*: the mesh takes the first N devices of every process rather than
    the first nodes*N of the global list (which would drop whole nodes'
    chips from the mesh)."""
    init_distributed(nodes)
    if nodes > 1 and devices not in ("auto", None):
        per_node = int(devices)
        all_devs = resolve_devices(accelerator, "auto")
        by_process: dict = {}
        for dev in all_devs:
            by_process.setdefault(dev.process_index, []).append(dev)
        devs = [
            dev
            for process_index in sorted(by_process)
            for dev in by_process[process_index][:per_node]
        ]
    else:
        devs = resolve_devices(accelerator, devices)
    return make_mesh(devs, model_parallel=model_parallel, nodes=nodes)


def _batch_axes(mesh: Mesh):
    """Mesh axes the batch dimension splits over (node-and-data when the
    mesh has a node axis)."""
    if NODE_AXIS in mesh.axis_names:
        return (NODE_AXIS, DATA_AXIS)
    return DATA_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis split over the (node×)data axes; rest replicated."""
    return NamedSharding(mesh, P(_batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch axis over `data`.
    Non-array entries (basenames) pass through untouched."""
    sharding = batch_sharding(mesh)
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray):
            out[key] = jax.device_put(value, sharding)
        elif hasattr(value, "shape"):
            out[key] = jax.device_put(value, sharding)
        else:
            out[key] = value
    return out


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def compress_for_transfer(batch: dict, keys: Sequence[str]) -> dict:
    """Cast selected float32 arrays to float16 on the host to halve
    host->device transfer bytes (the training loop is transfer-bound on
    hosts with modest device links). Jitted steps cast back to float32 on
    device, where the cast fuses away."""
    out = dict(batch)
    for key in keys:
        value = out.get(key)
        if value is not None and getattr(value, "dtype", None) == np.float32:
            out[key] = value.astype(np.float16)
    return out


def stack_batches(group: list) -> dict:
    """Stack K same-shape host batches into one (K, batch, ...) super-batch
    for multi-step execution (one dispatch runs K optimizer steps via
    lax.scan, amortizing per-step host/RPC overhead)."""
    return {k: np.stack([g[k] for g in group]) for k in group[0]}


def shard_stacked_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a (steps, batch, ...) stacked batch onto the mesh: the steps
    axis stays whole (scanned over inside jit), axis 1 splits over `data`."""
    sharding = NamedSharding(mesh, P(None, _batch_axes(mesh)))
    return {
        k: jax.device_put(v, sharding) if hasattr(v, "shape") else v
        for k, v in batch.items()
    }


def pad_batch_for_eval(
    batch: dict, n_devices: int, batch_size: Optional[int] = None
) -> tuple:
    """Pad an evaluation batch up to the full training `batch_size` (so the
    jitted eval step reuses one compile shape even for the trailing partial
    batch) — or, without one, to the next device multiple — by repeating
    rows cyclically, and record which rows are real in a `row_weights`
    (target,) float array added to the batch (1 = real, 0 = pad). Loss
    functions mask pad rows out with it so duplicated items never bias the
    monitored validation loss. Returns (padded_batch, n_true_rows)."""
    first = next(v for v in batch.values() if isinstance(v, np.ndarray))
    b = first.shape[0]
    target = max(batch_size or 0, b, 1)
    if target % n_devices:
        target += n_devices - target % n_devices
    weights = np.zeros(target, np.float32)
    weights[:b] = 1.0
    if target == b:
        return {**batch, "row_weights": weights}, b
    reps = np.arange(target - b) % b
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) and value.shape[:1] == (b,):
            out[key] = np.concatenate([value, value[reps]], axis=0)
        else:
            out[key] = value
    out["row_weights"] = weights
    return out, b


def pad_batch_to_devices(batch: dict, n_devices: int) -> dict:
    """Ensure the batch axis divides the data-axis size by repeating rows
    cyclically (rows are masked by *_lengths downstream). Handles batches
    smaller than the device count."""
    first = next(v for v in batch.values() if isinstance(v, np.ndarray))
    b = first.shape[0]
    remainder = b % n_devices
    if remainder == 0:
        return batch
    pad = n_devices - remainder
    reps = np.arange(pad) % b  # cyclic repetition covers pad > b
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) and value.shape[:1] == (b,):
            out[key] = np.concatenate([value, value[reps]], axis=0)
        else:
            out[key] = value
    return out

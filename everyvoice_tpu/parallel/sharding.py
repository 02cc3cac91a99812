"""Rule-based tensor-parallel parameter sharding.

The reference's only strategy is DDP (SURVEY.md §2.8) — parameters
replicated, gradients all-reduced. On a TPU mesh we keep that as the
default, but the `model` mesh axis is real, not just reserved: these rules
shard the FLOP-dense parameters of the Conformer blocks Megatron-style
(column-parallel first matmul, row-parallel second) over the `model` axis,
and XLA's SPMD partitioner inserts the matching all-reduces on ICI.

The design is the "How to Scale Your Model" recipe: pick a mesh, annotate
shardings on the parameter pytree (by path pattern), and let the compiler
place collectives. Any parameter not matched by a rule — or whose
dimensions don't divide the axis — stays replicated, so with
model_parallel=1 this degrades to exactly the reference-equivalent DDP.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from everyvoice_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path regex, spec) — applied in order, first match wins. Paths are the
# flax param-tree keys joined with "/".
#
# Megatron pairs inside each ConformerBlock:
#   * FeedForward: Dense_0 (dim→ff_dim) column-parallel, Dense_1
#     (ff_dim→dim) row-parallel ⇒ one psum per FF module.
#   * Attention: q/k/v kernels (dim, heads, head_dim) split over heads,
#     out kernel (heads, head_dim, dim) row-parallel over heads ⇒ one psum
#     per attention module; softmax/score math stays fully head-local.
FS2_PARAM_RULES: list[tuple[str, P]] = [
    (r".*/FeedForwardModule_\d+/Dense_0/kernel$", P(None, MODEL_AXIS)),
    (r".*/FeedForwardModule_\d+/Dense_0/bias$", P(MODEL_AXIS)),
    (r".*/FeedForwardModule_\d+/Dense_1/kernel$", P(MODEL_AXIS, None)),
    (r".*/MultiHeadDotProductAttention_\d+/(query|key|value)/kernel$",
     P(None, MODEL_AXIS, None)),
    (r".*/MultiHeadDotProductAttention_\d+/(query|key|value)/bias$",
     P(MODEL_AXIS, None)),
    (r".*/MultiHeadDotProductAttention_\d+/out/kernel$",
     P(MODEL_AXIS, None, None)),
]


def _path_str(path) -> str:
    parts = []
    for entry in path:
        if hasattr(entry, "key"):
            parts.append(str(entry.key))
        elif hasattr(entry, "idx"):
            parts.append(str(entry.idx))
        else:
            parts.append(str(entry))
    return "/".join(parts)


def _spec_fits(spec: P, shape: tuple, mesh: Mesh) -> bool:
    """A spec is usable only if every sharded dimension divides the mesh
    axis size (XLA would otherwise pad; we prefer clean replication)."""
    if len(spec) > len(shape):
        return False
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        size = axis_sizes.get(axis, 1)
        if size > 1 and dim % size != 0:
            return False
    return True


def param_shardings(
    params,
    mesh: Mesh,
    rules: Optional[Sequence[tuple[str, P]]] = None,
):
    """Pytree of NamedSharding mirroring `params`, by path-pattern rules.

    With a model axis of size 1 (or rules=None) everything is replicated —
    the reference-parity DDP layout."""
    if rules is None:
        rules = FS2_PARAM_RULES
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    model_size = axis_sizes.get(MODEL_AXIS, 1)
    compiled = [(re.compile(pattern), spec) for pattern, spec in rules]

    def assign(path, leaf):
        if model_size > 1 and hasattr(leaf, "shape"):
            name = _path_str(path)
            for pattern, spec in compiled:
                if pattern.match(name) and _spec_fits(spec, leaf.shape, mesh):
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def fsdp_shardings(params, mesh: Mesh, min_size: int = 16_384):
    """Pytree of NamedSharding implementing ZeRO-3-style fully-sharded data
    parallelism: each large parameter is split over the `data` axis on its
    largest evenly-divisible dimension, so per-device parameter (and, via
    `shard_opt_state_like`, optimizer-state) memory scales as 1/N. Under
    jit-SPMD, XLA inserts the all-gather before each use and a
    reduce-scatter for the gradients — the standard TPU FSDP recipe
    ("How to Scale Your Model", fully-sharded data parallelism).

    Leaves smaller than `min_size` elements (biases, LayerNorm scales) stay
    replicated: gathering them costs more latency than their memory is
    worth."""
    from everyvoice_tpu.parallel.mesh import NODE_AXIS

    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    # Shard over every batch-like axis — (node, data) on multi-node meshes —
    # so per-device memory really scales as 1/N, not 1/(per-node data size).
    shard_axes = tuple(
        a for a in (NODE_AXIS, DATA_AXIS) if axis_sizes.get(a, 1) > 1
    )
    total_size = 1
    for a in shard_axes:
        total_size *= axis_sizes[a]

    def assign(leaf):
        shape = getattr(leaf, "shape", None)
        if (
            total_size > 1
            and shape
            and int(np_prod(shape)) >= min_size
        ):
            # Largest dimension that divides the combined axis size evenly.
            candidates = [
                (dim, i) for i, dim in enumerate(shape)
                if dim % total_size == 0
            ]
            if candidates:
                _, idx = max(candidates)
                spec = [None] * len(shape)
                spec[idx] = shard_axes if len(shard_axes) > 1 else shard_axes[0]
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(assign, params)


def np_prod(shape) -> int:
    out = 1
    for dim in shape:
        out *= int(dim)
    return out


def shard_params(params, mesh: Mesh, rules=None, fsdp: bool = False,
                 fsdp_min_size: int = 16_384):
    """Place a parameter pytree onto the mesh: TP rules over the `model`
    axis when it is non-trivial, ZeRO-3 FSDP over the `data` axis when
    requested, fully replicated (reference-parity DDP) otherwise."""
    if fsdp:
        return jax.device_put(
            params, fsdp_shardings(params, mesh, min_size=fsdp_min_size)
        )
    return jax.device_put(params, param_shardings(params, mesh, rules))


def shard_opt_state_like(opt_state, optimizer_init, sharded_params):
    """Place an optimizer state on the mesh with layouts that mirror the
    (already-sharded) parameters: jit the optimizer init on the sharded
    params and let XLA propagate shardings, then transfer the host state
    into those layouts. Leaves whose layout does not derive from any input
    (e.g. the step counter, which XLA leaves on the default device) are
    replicated across the mesh."""
    mesh = None
    for leaf in jax.tree_util.tree_leaves(sharded_params):
        sharding = getattr(leaf, "sharding", None)
        if isinstance(sharding, NamedSharding):
            mesh = sharding.mesh
            break
    template = jax.jit(optimizer_init)(sharded_params)

    def layout(leaf):
        sharding = getattr(leaf, "sharding", None)
        if isinstance(sharding, NamedSharding) and sharding.mesh == mesh:
            return sharding
        return NamedSharding(mesh, P())

    shardings = jax.tree_util.tree_map(
        layout, template, is_leaf=lambda x: hasattr(x, "sharding")
    )
    return jax.device_put(opt_state, shardings)


def fresh_sharded_opt_state(optimizer_init, sharded_params):
    """Sharded ZERO-initialized optimizer state without a host round trip:
    jit the init on the already-sharded parameters so XLA propagates the
    parameter layouts, then re-place only the leaves XLA left on a single
    device (e.g. scalar step counters) as replicated. Use this instead of
    `shard_opt_state_like` when there is no host state to restore."""
    mesh = None
    for leaf in jax.tree_util.tree_leaves(sharded_params):
        sharding = getattr(leaf, "sharding", None)
        if isinstance(sharding, NamedSharding):
            mesh = sharding.mesh
            break
    state = jax.jit(optimizer_init)(sharded_params)
    if mesh is None:
        return state

    def fix(leaf):
        sharding = getattr(leaf, "sharding", None)
        if isinstance(sharding, NamedSharding) and sharding.mesh == mesh:
            return leaf
        return jax.device_put(jax.device_get(leaf), NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(fix, state)


class Strategy(NamedTuple):
    """Resolved --strategy: model-parallel degree + FSDP flag."""

    model_parallel: int = 1
    fsdp: bool = False


def parse_strategy(strategy: str) -> Strategy:
    """Map the reference CLI's --strategy string onto a sharding strategy:
    'ddp'/'auto'/'' → pure data parallel (the reference behavior,
    base_cli/interfaces.py:90-97); 'tp<k>' or 'ddp_tp<k>' → k-way tensor
    parallelism over the mesh's `model` axis; 'fsdp' → ZeRO-3 parameter +
    optimizer-state sharding over the `data` axis."""
    if not strategy:
        return Strategy()
    text = strategy.strip().lower()
    if text in ("ddp", "auto"):
        return Strategy()
    if text == "fsdp":
        return Strategy(model_parallel=1, fsdp=True)
    match = re.fullmatch(r"(?:ddp_)?tp(\d+)", text)
    if match:
        return Strategy(model_parallel=max(int(match.group(1)), 1))
    # A silently-ignored near-miss ('fsdp2', 'ddp_fsdp') would train with
    # the wrong parallelism; fail loudly instead.
    raise ValueError(
        f"Unknown --strategy {strategy!r}; expected ddp, auto, fsdp, "
        "tp<k>, or ddp_tp<k>."
    )

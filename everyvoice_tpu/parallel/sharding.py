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
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from everyvoice_tpu.parallel.mesh import MODEL_AXIS

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


def shard_params(params, mesh: Mesh, rules=None):
    """Place a parameter pytree onto the mesh under the TP rules (or fully
    replicated when the model axis is trivial)."""
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


def parse_strategy(strategy: str) -> int:
    """Map the reference CLI's --strategy string onto a model-parallel
    degree: 'ddp'/'auto'/'' → 1 (pure data parallel, the reference
    behavior, base_cli/interfaces.py:90-97); 'tp<k>' or 'ddp_tp<k>' → k-way
    tensor parallelism over the mesh's `model` axis."""
    if not strategy:
        return 1
    match = re.fullmatch(r"(?:ddp_)?tp(\d+)", strategy.strip().lower())
    if match:
        return max(int(match.group(1)), 1)
    return 1

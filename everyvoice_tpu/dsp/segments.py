"""Random fixed-size segment sampling for vocoder training
(parity: everyvoice/utils/heavy.py:122-148).

The TPU version is functional: randomness comes from an explicit jax PRNG
key, and the slice is a fixed-size dynamic_slice so the op jits with static
shapes. A batched variant samples an independent start per batch element,
which the reference's per-item DataLoader did implicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_segment(
    t: jnp.ndarray,
    segment_size: int,
    key: jax.Array | None = None,
    start: int | jnp.ndarray | None = None,
) -> tuple:
    """Slice a (C, T) tensor to (C, segment_size) starting at `start` (or a
    random position); zero-pads if too short. Returns (segment, start)."""
    t_len = t.shape[-1]
    if t_len < segment_size:
        pad = segment_size - t_len
        padded = jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, pad)])
        return padded, jnp.asarray(0)
    max_start = t_len - segment_size - 1
    if start is None:
        assert key is not None, "Provide a PRNG key for random segment sampling"
        start = jax.random.randint(key, (), 0, max_start + 1)
    start = jnp.asarray(start)
    seg = jax.lax.dynamic_slice_in_dim(t, start, segment_size, axis=t.ndim - 1)
    return seg, start


def get_segments_batched(
    batch: jnp.ndarray,
    lengths: jnp.ndarray,
    segment_size: int,
    key: jax.Array,
) -> tuple:
    """Sample one segment per batch row from (B, ..., T) padded tensors,
    respecting each row's true length. Returns (segments (B, ..., S), starts)."""
    b = batch.shape[0]
    keys = jax.random.split(key, b)

    def one(row, length, k):
        max_start = jnp.maximum(length - segment_size, 0)
        start = jax.random.randint(k, (), 0, jnp.maximum(max_start, 1))
        seg = jax.lax.dynamic_slice_in_dim(
            row, start, segment_size, axis=row.ndim - 1
        )
        # Zero out any padding the slice may have captured for short rows.
        valid = jnp.arange(segment_size) < jnp.maximum(length - start, 0)
        shape = [1] * (row.ndim - 1) + [segment_size]
        return seg * valid.reshape(shape), start

    return jax.vmap(one)(batch, lengths, keys)

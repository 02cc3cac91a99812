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
    # Inclusive last valid start (t_len - segment_size), matching the
    # reference's random.randint bounds — randint's upper bound here is
    # exclusive, so add 1.
    max_start = t_len - segment_size
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
    axis: int = 1,
    starts: jnp.ndarray | None = None,
) -> tuple:
    """Sample one segment per batch row from padded tensors, slicing along
    `axis` (the time axis of the batched array; default 1, i.e. (B, T, ...)),
    respecting each row's true length. Returns (segments, starts)."""
    b = batch.shape[0]
    keys = jax.random.split(key, b)
    row_axis = axis - 1  # time axis within one row

    def one(row, length, k, given_start):
        max_start = jnp.maximum(length - segment_size, 0)
        # Upper bound exclusive: +1 keeps the final valid start reachable.
        random_start = jax.random.randint(k, (), 0, max_start + 1)
        start = random_start if given_start is None else given_start
        seg = jax.lax.dynamic_slice_in_dim(row, start, segment_size, axis=row_axis)
        # Zero out any padding the slice may have captured for short rows.
        valid = jnp.arange(segment_size) < jnp.maximum(length - start, 0)
        shape = [1] * row.ndim
        shape[row_axis] = segment_size
        return seg * valid.reshape(shape), start

    if starts is None:
        return jax.vmap(lambda r, l, k: one(r, l, k, None))(batch, lengths, keys)
    return jax.vmap(lambda r, l, s: one(r, l, keys[0], s))(batch, lengths, starts)

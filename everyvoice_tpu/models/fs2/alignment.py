"""Unsupervised text↔mel alignment learning under static shapes.

The reference's fs2 model (learn_alignment=True, SURVEY.md §2.3) learns
alignment with the "one TTS alignment to rule them all" recipe: a soft
attention between text keys and mel queries shaped by a beta-binomial prior,
trained with a forward-sum (CTC-like) loss, plus a KL/binarization loss
against the Viterbi (monotonic alignment search) hard path whose per-phone
sums become the duration targets.

Everything here is fixed-shape: both the forward-sum and the Viterbi DP are
`lax.scan`s over the mel axis with masking for padding, so the whole thing
jits and shards with the rest of the training step.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


class AlignmentEncoder(nn.Module):
    """Projects text encodings (keys) and target mels (queries) into a shared
    space and produces masked log-attention (B, T_mel, N_text)."""

    dim: int = 256
    temperature: float = 0.0005

    @nn.compact
    def __call__(self, text_enc, mel, src_mask, mel_mask, prior=None):
        # Key path: two convs over text encodings.
        k = nn.Conv(self.dim * 2, kernel_size=(3,), padding="SAME")(text_enc)
        k = nn.relu(k)
        k = nn.Conv(self.dim, kernel_size=(1,))(k)
        # Query path: three convs over the target mel.
        q = nn.Conv(self.dim * 2, kernel_size=(3,), padding="SAME")(mel)
        q = nn.relu(q)
        q = nn.Conv(self.dim, kernel_size=(1,))(q)
        q = nn.relu(q)
        q = nn.Conv(self.dim, kernel_size=(1,))(q)

        # Negative squared L2 distance, scaled: (B, T, N)
        dist = (
            jnp.sum(q * q, axis=-1)[:, :, None]
            - 2.0 * jnp.einsum("btd,bnd->btn", q, k)
            + jnp.sum(k * k, axis=-1)[:, None, :]
        )
        attn_logprob = -self.temperature * dist
        if prior is not None:
            attn_logprob = attn_logprob + jnp.log(prior + 1e-8)
        # Mask invalid text positions with -inf; invalid mel rows are handled
        # by the losses via mel_mask.
        attn_logprob = jnp.where(src_mask[:, None, :], attn_logprob, NEG_INF)
        attn_soft = jax.nn.softmax(attn_logprob, axis=-1)
        attn_soft = jnp.where(mel_mask[:, :, None], attn_soft, 0.0)
        return attn_soft, attn_logprob


def forward_sum_loss(
    attn_logprob: jnp.ndarray,
    src_lengths: jnp.ndarray,
    mel_lengths: jnp.ndarray,
    row_weights: jnp.ndarray = None,
) -> jnp.ndarray:
    """Monotonic forward-sum (CTC-like, no blank) alignment loss.

    α[t, n] = logp̂[t, n] + logaddexp(α[t−1, n], α[t−1, n−1]); the loss is
    −α[T−1, N−1] normalized by mel length, averaged over the batch
    (optionally weighted by 0/1 `row_weights` to drop pad rows)."""
    b, t_max, n_max = attn_logprob.shape
    # Log-softmax over the text axis restricted to valid positions.
    text_mask = jnp.arange(n_max)[None, :] < src_lengths[:, None]
    logits = jnp.where(text_mask[:, None, :], attn_logprob, NEG_INF)
    logp = jax.nn.log_softmax(logits, axis=-1)

    init = jnp.where(
        jnp.arange(n_max)[None, :] == 0, logp[:, 0, :], NEG_INF
    )  # (B, N)

    def step(alpha, logp_t):
        shifted = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF), alpha[:, :-1]], axis=1
        )
        alpha_new = logp_t + jnp.logaddexp(alpha, shifted)
        return alpha_new, alpha_new

    # Scan over mel frames 1..T-1, collecting alphas for each t.
    _, alphas = jax.lax.scan(step, init, jnp.swapaxes(logp[:, 1:, :], 0, 1))
    alphas = jnp.concatenate([init[None], alphas], axis=0)  # (T, B, N)

    # Pick α at (t = mel_len−1, n = src_len−1) per batch element.
    t_idx = jnp.clip(mel_lengths - 1, 0, t_max - 1)
    n_idx = jnp.clip(src_lengths - 1, 0, n_max - 1)
    final = alphas[t_idx, jnp.arange(b), n_idx]
    per_row = -final / jnp.maximum(mel_lengths, 1)
    if row_weights is None:
        return jnp.mean(per_row)
    return jnp.sum(per_row * row_weights) / jnp.maximum(
        jnp.sum(row_weights), 1.0
    )


def viterbi_alignment(
    attn_logprob: jnp.ndarray,
    src_lengths: jnp.ndarray,
    mel_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Monotonic alignment search: the binary (B, T, N) path maximizing the
    summed log-probability subject to monotonicity with no phone skipped.
    Fixed-shape lax.scan forward DP + reverse backtrace."""
    b, t_max, n_max = attn_logprob.shape
    text_mask = jnp.arange(n_max)[None, :] < src_lengths[:, None]
    logits = jnp.where(text_mask[:, None, :], attn_logprob, NEG_INF)
    logp = jax.nn.log_softmax(logits, axis=-1)

    init = jnp.where(jnp.arange(n_max)[None, :] == 0, logp[:, 0, :], NEG_INF)

    def fwd(q, logp_t):
        shifted = jnp.concatenate([jnp.full((b, 1), NEG_INF), q[:, :-1]], axis=1)
        stay = q >= shifted  # True: came from same phone
        q_new = logp_t + jnp.maximum(q, shifted)
        return q_new, (q_new, stay)

    q_last, (qs, stays) = jax.lax.scan(
        fwd, init, jnp.swapaxes(logp[:, 1:, :], 0, 1)
    )
    # stays: (T-1, B, N) choice bits for frames 1..T-1.
    stays = jnp.concatenate(
        [jnp.ones((1, b, n_max), dtype=bool), stays], axis=0
    )  # frame 0 trivially "stays"

    # Backtrace from (mel_len-1, src_len-1) down to frame 0.
    t_idx = jnp.clip(mel_lengths - 1, 0, t_max - 1)
    n_end = jnp.clip(src_lengths - 1, 0, n_max - 1)

    def bwd(n_cur, t):
        # t runs from t_max-1 down to 0; only frames < mel_len participate.
        active = t <= t_idx
        stay_bit = stays[t, jnp.arange(b), jnp.clip(n_cur, 0, n_max - 1)]
        n_here = jnp.where(active, n_cur, -1)
        # At the frame t, if this frame "stayed", previous frame had same n;
        # else it had n-1. Frames above mel_len keep the end phone index.
        n_prev = jnp.where(
            active & (t > 0), jnp.where(stay_bit, n_cur, n_cur - 1), n_cur
        )
        # Frames beyond the valid range hold n_end until we reach t_idx.
        n_prev = jnp.where(t > t_idx, n_end, n_prev)
        return n_prev, n_here

    _, path = jax.lax.scan(
        bwd, n_end, jnp.arange(t_max - 1, -1, -1)
    )
    path = jnp.flip(path, axis=0)  # (T, B)
    path = jnp.swapaxes(path, 0, 1)  # (B, T)
    hard = jax.nn.one_hot(path, n_max, dtype=attn_logprob.dtype)
    mel_mask = jnp.arange(t_max)[None, :] < mel_lengths[:, None]
    return jnp.where(mel_mask[:, :, None] & (path >= 0)[..., None], hard, 0.0)


def binarization_loss(attn_soft: jnp.ndarray, attn_hard: jnp.ndarray) -> jnp.ndarray:
    """KL between the hard path and the soft attention: −log p_soft along the
    hard path, averaged over valid frames."""
    eps = 1e-8
    per_frame = -jnp.log(jnp.sum(attn_soft * attn_hard, axis=-1) + eps)
    valid = jnp.sum(attn_hard, axis=-1) > 0
    return jnp.sum(jnp.where(valid, per_frame, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )


def durations_from_hard_attention(attn_hard: jnp.ndarray) -> jnp.ndarray:
    """(B, T, N) binary alignment → (B, N) integer durations."""
    return jnp.sum(attn_hard, axis=1).astype(jnp.int32)


def phone_average_by_durations(
    frame_values: jnp.ndarray, durations: jnp.ndarray
) -> jnp.ndarray:
    """Average frame-level values (B, T) into phones (B, N) using explicit
    durations — cumulative-sum segment means, fixed shape (the
    learn_alignment=False path; reference preprocessor.py:288-300)."""
    t = frame_values.shape[1]
    cum = jnp.cumsum(durations, axis=1)
    csum = jnp.concatenate(
        [jnp.zeros_like(frame_values[:, :1]),
         jnp.cumsum(frame_values, axis=1)],
        axis=1,
    )
    ends = jnp.clip(cum, 0, t)
    starts = jnp.clip(cum - durations, 0, t)
    sums = jnp.take_along_axis(csum, ends, axis=1) - jnp.take_along_axis(
        csum, starts, axis=1
    )
    return jnp.where(durations > 0, sums / jnp.maximum(durations, 1), 1e-7)


def phone_average(frame_values: jnp.ndarray, attn_hard: jnp.ndarray) -> jnp.ndarray:
    """Average frame-level values (B, T) into phone-level values (B, N)
    using the hard alignment — the reference's average_data_by_durations
    (preprocessor.py:288-300) expressed as one einsum."""
    counts = jnp.sum(attn_hard, axis=1)
    sums = jnp.einsum("btn,bt->bn", attn_hard, frame_values)
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 1e-7)

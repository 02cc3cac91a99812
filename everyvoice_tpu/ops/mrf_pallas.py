"""Fused HiFiGAN MRF (multi-receptive-field) stage as one Pallas TPU kernel.

This kernel computes an ENTIRE MRF stage — all three ResBlock1 chains
(2 convs x 3 dilations each) plus the final mean — on a time tile held in
VMEM (reference architecture: the hfgl submodule's torch ResBlock1 chain,
SURVEY.md §2.4). Each conv is ONE im2col matmul on the MXU (tap-shifted
views lane-concatenated into (tile, k·C) patches); residuals, biases and
leaky-relus stay in VMEM, so each stage makes exactly one HBM read + write
of its activation instead of one per conv.

Halo handling: the input is zero-padded by the receptive-field halo
(<= 6·(k-1) samples for ResBlock1); each grid step assembles an overlapping
window from two consecutive tile views (Mosaic double-buffers the streams),
and rows outside the true sequence are re-zeroed after every conv so edge
behavior matches flax's per-conv 'SAME' zero padding exactly.

MEASURED OUTCOME (TPU v5e, serving shapes, bf16 — see docs/guides/tpu.md):
XLA's own conv lowering matches or slightly beats this kernel at every
stage (0.70-0.98x speedup, i.e. none). These conv chains are MXU-bound at
an N=C_out lane ceiling that no dense reformulation lifts, and XLA already
fuses the elementwise chain; HBM traffic was not the binding constraint.
The kernel is kept as a validated reference implementation
(tests/test_ops.py) and an experimentation hook
(`fused_generator_apply`); the serving path stays on the XLA convs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def resblock1_halo(kernel_size: int, dilations) -> int:
    """One-sided receptive-field growth of a ResBlock1 chain."""
    return sum((kernel_size - 1) // 2 * (d + 1) for d in dilations)


def _mrf_kernel(
    xa_ref, xb_ref, *refs,
    t_tile: int,
    halo: int,
    channels: int,
    t_true: int,
    kernel_sizes: tuple,
    dilation_sizes: tuple,
    slope: float,
    out_dtype,
):
    from jax.experimental import pallas as pl

    n_convs = sum(2 * len(d) for d in dilation_sizes)
    w_refs = refs[:n_convs]
    b_refs = refs[n_convs : 2 * n_convs]
    out_ref = refs[2 * n_convs]

    window = t_tile + 2 * halo
    ti = pl.program_id(1)

    # The window [ti*t_tile, ti*t_tile + window) over the padded input is
    # assembled from two consecutive full tiles (Mosaic double-buffers the
    # block streams; window <= 2*t_tile because halo <= t_tile/2).
    mm_dtype = xa_ref.dtype  # matmul inputs in the model's compute dtype
    x = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)[:window]
    x = x.astype(jnp.float32)  # (window, C)

    # Rows whose global position falls outside the true sequence must stay
    # zero after every conv (flax pads each conv input with zeros there).
    g = (
        jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0)
        + ti * t_tile
        - halo
    )
    in_seq = (g >= 0) & (g < t_true)

    def leaky(v):
        # max-form leaky relu: compare-free (Mosaic on some targets has no
        # bf16 vector compare, and f32 max is a single VPU op).
        return jnp.maximum(v, slope * v)

    def conv(v, w_ref, b_ref, k, d):
        """'SAME' dilated conv as ONE im2col matmul on the MXU: lane-concat
        the k tap-shifted views into (window, k·C) patches so the
        contraction dimension is k·C (not C, which would idle most of the
        systolic array at these channel widths). Tap shifts are static
        rolls; wrap-around garbage stays inside the halo margin. The weight
        ref is already laid out (k·C, C) in matching tap-major order."""
        vc = v.astype(mm_dtype)
        center = (k - 1) // 2
        patches = jnp.concatenate(
            [
                jnp.roll(vc, -(j - center) * d, axis=0) if j != center else vc
                for j in range(k)
            ],
            axis=1,
        )
        acc = jnp.dot(
            patches, w_ref[:], preferred_element_type=jnp.float32
        )
        acc += b_ref[0, :][None, :].astype(jnp.float32)
        return jnp.where(in_seq, acc, 0.0)

    total = jnp.zeros((window, channels), jnp.float32)
    wi = 0
    for k, dils in zip(kernel_sizes, dilation_sizes):
        cur = x
        for d in dils:
            y = leaky(cur)
            y = conv(y, w_refs[wi], b_refs[wi], k, d)
            y = leaky(y)
            y = conv(y, w_refs[wi + 1], b_refs[wi + 1], k, 1)
            cur = cur + y
            wi += 2
        total += cur
    out = total[halo : halo + t_tile, :] / len(kernel_sizes)
    out_ref[0, :, :] = out.astype(out_dtype)


def _pick_tile(t: int, channels: int) -> int:
    """Largest tile with tile·C <= 128k elements (f32 working set of ~10
    live tensors stays under the ~16-32MB Mosaic scoped-VMEM budget) that
    divides the (padded) time axis; time is padded up to a multiple when
    needed."""
    budget = max(128_000 // max(channels, 1), 512)
    tile = min(t, budget)
    return max((tile // 8) * 8, 8)


@partial(
    jax.jit,
    static_argnames=(
        "kernel_sizes", "dilation_sizes", "slope", "interpret"
    ),
)
def fused_mrf(
    x: jnp.ndarray,            # (B, T, C)
    weights: tuple,            # per conv, (k·C, C), chain order
    biases: tuple,             # per conv, (1, C)
    kernel_sizes: tuple = (3, 7, 11),
    dilation_sizes: tuple = ((1, 3, 5),) * 3,
    slope: float = 0.1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Mean over parallel ResBlock1 chains, numerically matching the flax
    MRF loop in HiFiGANGenerator (models/hifigan/model.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = x.shape
    halo = max(
        resblock1_halo(k, d) for k, d in zip(kernel_sizes, dilation_sizes)
    )
    halo = -(-halo // 8) * 8  # sublane-align the window offsets
    t_tile = max(_pick_tile(t, c), 2 * halo)
    n_tiles = -(-t // t_tile)
    t_pad = n_tiles * t_tile
    # Left halo, then right halo + tile remainder + one extra tile so the
    # (ti+1) view stays in bounds on the last grid step.
    x_padded = jnp.pad(
        x, ((0, 0), (halo, t_tile + halo + (t_pad - t)), (0, 0))
    )

    const = lambda i, j: (0, 0)  # noqa: E731
    w_specs = [
        pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM)
        for w in weights
    ]
    b_specs = [
        pl.BlockSpec(bb.shape, const, memory_space=pltpu.VMEM)
        for bb in biases
    ]
    tile_view = lambda shift: pl.BlockSpec(  # noqa: E731
        (1, t_tile, c),
        lambda i, j, s=shift: (i, j + s, 0),
        memory_space=pltpu.VMEM,
    )

    out = pl.pallas_call(
        partial(
            _mrf_kernel,
            t_tile=t_tile,
            halo=halo,
            channels=c,
            t_true=t,
            kernel_sizes=tuple(kernel_sizes),
            dilation_sizes=tuple(tuple(d) for d in dilation_sizes),
            slope=slope,
            out_dtype=x.dtype,
        ),
        grid=(b, n_tiles),
        in_specs=[tile_view(0), tile_view(1)] + w_specs + b_specs,
        out_specs=pl.BlockSpec(
            (1, t_tile, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(x_padded, x_padded, *weights, *biases)
    return out[:, :t, :]


# ---------------------------------------------------------------------------
# Serving fast path: full HiFiGAN generator forward with fused MRF stages.


def weight_norm_kernel(kernel: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Fold flax WeightNorm at inference: W_eff = scale · W / ||W||, norm
    over all axes but the trailing feature axis (flax.linen.WeightNorm
    feature_axes=-1)."""
    axes = tuple(range(kernel.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(kernel), axis=axes, keepdims=True))
    return kernel * (scale / jnp.squeeze(norm))


def extract_fused_weights(generator, params) -> dict:
    """Pull effective (weight-norm-folded) kernels out of a
    HiFiGANGenerator param tree, keyed for `fused_generator_apply`.

    Layout (per flax nn.compact naming, models/hifigan/model.py):
      WeightNorm_0/Conv_0          initial conv
      WeightNorm_{1+i}/ConvTranspose_i    per-stage upsampler
      ResBlock1_{i·R + r}/Conv_{2u},{2u+1} with matching WeightNorm scales
      WeightNorm_{1+S}/Conv_1      waveform (or iSTFT) head
    """
    p = params["params"]
    n_stages = len(generator.upsample_rates)
    n_branches = len(generator.resblock_kernel_sizes)

    def wn(conv_name, wn_name):
        conv = p[conv_name]
        scale = p[wn_name][f"{conv_name}/kernel/scale"]
        return weight_norm_kernel(conv["kernel"], scale), conv["bias"]

    out = {
        "init": wn("Conv_0", "WeightNorm_0"),
        "stages": [],
        "head": wn("Conv_1", f"WeightNorm_{1 + n_stages}"),
    }
    for i in range(n_stages):
        up = wn(f"ConvTranspose_{i}", f"WeightNorm_{1 + i}")
        branches = []
        for r in range(n_branches):
            block = p[f"ResBlock1_{i * n_branches + r}"]
            convs = []
            n_units = len(generator.resblock_dilation_sizes[r])
            for u in range(2 * n_units):
                kern = weight_norm_kernel(
                    block[f"Conv_{u}"]["kernel"],
                    block[f"WeightNorm_{u}"][f"Conv_{u}/kernel/scale"],
                )
                convs.append((kern, block[f"Conv_{u}"]["bias"]))
            branches.append(convs)
        out["stages"].append((up, branches))
    return out


def fused_generator_apply(
    generator,
    params,
    mel: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """HiFiGANGenerator forward with Pallas-fused MRF stages — numerically
    equivalent to `generator.apply(params, mel)` for resblock type '1'
    (validated in tests/test_ops.py). Inference only (no dropout, no
    gradients through the kernel)."""
    from everyvoice_tpu.dsp.spectral import istft
    from everyvoice_tpu.models.hifigan.model import LRELU_SLOPE

    assert generator.resblock == "1", "fused path supports resblock '1'"
    dt = jnp.dtype(generator.compute_dtype)
    fw = extract_fused_weights(generator, params)

    def conv1d(v, kernel, bias, dilation=1):
        y = jax.lax.conv_general_dilated(
            v.astype(dt), kernel.astype(dt),
            window_strides=(1,),
            padding="SAME",
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias.astype(dt)[None, None, :]

    x = conv1d(mel, *fw["init"])
    for (rate, kernel), ((up_k, up_b), branches) in zip(
        zip(generator.upsample_rates, generator.upsample_kernel_sizes),
        fw["stages"],
    ):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = jax.lax.conv_transpose(
            x.astype(dt), up_k.astype(dt),
            strides=(rate,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + up_b.astype(dt)[None, None, :]
        c = x.shape[-1]
        weights, biases = [], []
        for convs in branches:
            for kern, bias in convs:
                weights.append(
                    kern.astype(dt).reshape(-1, c)  # (k·C, C)
                )
                biases.append(bias.astype(dt)[None, :])
        x = fused_mrf(
            x, tuple(weights), tuple(biases),
            kernel_sizes=tuple(generator.resblock_kernel_sizes),
            dilation_sizes=tuple(
                tuple(d) for d in generator.resblock_dilation_sizes
            ),
            slope=LRELU_SLOPE,
            interpret=interpret,
        )
    x = jax.nn.leaky_relu(x, LRELU_SLOPE)
    x = x.astype(jnp.float32)
    head_k, head_b = fw["head"]
    if generator.istft_layer:
        n_bins = generator.istft_n_fft // 2 + 1
        y = jax.lax.conv_general_dilated(
            x, head_k.astype(jnp.float32),
            window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + head_b[None, None, :]
        mag = jnp.exp(jnp.clip(y[..., :n_bins], -10.0, 8.0))
        phase = jnp.pi * jnp.sin(y[..., n_bins:])
        expected = (
            mel.shape[1]
            * int(np.prod(generator.upsample_rates))
            * generator.istft_hop
        )
        return istft(
            jnp.swapaxes(mag * jnp.cos(phase), 1, 2),
            jnp.swapaxes(mag * jnp.sin(phase), 1, 2),
            generator.istft_n_fft,
            generator.istft_n_fft,
            generator.istft_hop,
            center=True,
            length=expected,
        )
    y = jax.lax.conv_general_dilated(
        x, head_k.astype(jnp.float32),
        window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + head_b[None, None, :]
    return jnp.tanh(y)[..., 0]

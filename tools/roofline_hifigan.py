"""Roofline accounting for the full HiFiGAN GAN train step on TPU v5e.

Answers VERDICT r3 weak-item #3: what MFU *can* the GAN step's shape mix
reach, given (a) MXU tile occupancy — a 128x128 systolic array wastes
lanes when a conv's contracting dimension (kernel_size x C_in, per group)
or output-channel dimension is far from a multiple of 128 — and (b) HBM
bandwidth — waveform-scale activations make the small-kernel layers
memory-bound regardless of occupancy.

The layer list is derived from the production geometry in
`everyvoice_tpu/models/hifigan/model.py` (HiFiGANGenerator V1,
MPD[2,3,5,7,11], MSDx3) at the bench configuration (batch 16, 8192-sample
segments, bf16 conv compute). Per conv layer the model times three matmul
passes (forward, input-gradient, weight-gradient) at their individual MXU
occupancies and HBM traffic, with per-pass multiplicities that match the
jitted step in `train/loop.py:685-790`:

  generator      fwd x2 (disc-step fake + gen-step fake; distinct because
                 disc_params differ after the disc update), dgrad x1,
                 wgrad x1 (gen update only)
  discriminators fwd x4 (disc step real+fake, gen step real+fake),
                 dgrad x3 (disc-update real+fake chains + gen-update fake
                 chain), wgrad x2 (disc update real+fake)

Run: python tools/roofline_hifigan.py  (pure host math, no jax needed)
"""

from __future__ import annotations

import math
from dataclasses import dataclass

PEAK_BF16 = 197e12  # TPU v5e peak dense bf16 matmul FLOPs/s
HBM_BW = 819e9      # TPU v5e HBM bandwidth, bytes/s
DTYPE_BYTES = 2     # bf16 conv compute (trainer resolve_compute_dtype)

BATCH = 16
SEGMENT = 8192
N_MELS = 80
HOP = 256


def _fill(n: int, tile: int = 128) -> float:
    """Fraction of a `tile`-wide MXU dimension actually used."""
    return n / (math.ceil(n / tile) * tile)


@dataclass
class Pass:
    """One matmul pass of a conv layer: M x K @ K x N, G independent
    groups, `mult` executions per train step."""

    name: str
    m: int          # rows (batch x spatial positions)
    k: int          # contracting dim
    n: int          # output dim
    groups: int
    mult: float
    in_bytes: float
    out_bytes: float
    w_bytes: float

    @property
    def flops(self) -> float:
        return 2.0 * self.m * self.k * self.n * self.groups * self.mult

    @property
    def occupancy(self) -> float:
        # M maps to 8-row sublanes (always nearly full at these sizes);
        # K and N pad to 128 lanes.
        return _fill(self.m, 8) * _fill(self.k) * _fill(self.n)

    @property
    def bytes(self) -> float:
        return (self.in_bytes + self.out_bytes + self.w_bytes) * self.mult

    @property
    def t_mxu(self) -> float:
        return self.flops / (PEAK_BF16 * max(self.occupancy, 1e-9))

    @property
    def t_hbm(self) -> float:
        return self.bytes / HBM_BW

    @property
    def t(self) -> float:
        return max(self.t_mxu, self.t_hbm)


def conv_passes(name, positions, k, cin, cout, groups=1,
                fwd=1.0, dgrad=1.0, wgrad=1.0):
    """The three matmul passes of one (grouped) conv layer.

    fwd:   (B*P) x (k*Cin/G) @ .. x (Cout/G)      per group
    dgrad: (B*P) x (k*Cout/G) @ .. x (Cin/G)      per group
    wgrad: (k*Cin/G) x (B*P) @ .. x (Cout/G)      per group
    """
    m = BATCH * positions
    cin_g, cout_g = cin // groups, cout // groups
    act_in = m * cin * DTYPE_BYTES
    act_out = m * cout * DTYPE_BYTES
    w = k * cin_g * cout * DTYPE_BYTES
    out = []
    if fwd:
        out.append(Pass(f"{name}:fwd", m, k * cin_g, cout_g, groups, fwd,
                        act_in, act_out, w))
    if dgrad:
        out.append(Pass(f"{name}:dgrad", m, k * cout_g, cin_g, groups, dgrad,
                        act_out, act_in, w))
    if wgrad:
        # contracting over M (large, fully filled); weights written f32
        out.append(Pass(f"{name}:wgrad", k * cin_g, m, cout_g, groups, wgrad,
                        act_in + act_out, 0, 2 * w))
    return out


def generator_layers():
    """HiFiGAN V1: conv_pre -> 4 upsample stages each with MRF(3 kernels x
    3 dilations, 2 convs per dilation) -> conv_post."""
    mult = dict(fwd=2.0, dgrad=1.0, wgrad=1.0)
    layers = []
    frames = SEGMENT // HOP  # 32 mel frames
    layers += conv_passes("g.conv_pre", frames, 7, N_MELS, 512, **mult)
    ch, pos = 512, frames
    for i, (rate, k) in enumerate(zip((8, 8, 2, 2), (16, 16, 4, 4))):
        up_ch = ch // 2
        # ConvTranspose: FLOPs equal the equivalent gather-conv at output
        # positions with k/rate effective taps per output sample.
        layers += conv_passes(f"g.up{i}", pos * rate, max(k // rate, 1),
                              ch, up_ch, **mult)
        pos, ch = pos * rate, up_ch
        for kr in (3, 7, 11):
            for _ in (1, 3, 5):     # dilations: two convs per dilation
                layers += conv_passes(f"g.mrf{i}.k{kr}a", pos, kr, ch, ch,
                                      **mult)
                layers += conv_passes(f"g.mrf{i}.k{kr}b", pos, kr, ch, ch,
                                      **mult)
    layers += conv_passes("g.conv_post", pos, 7, ch, 1, **mult)
    return layers


def discriminator_layers():
    mult = dict(fwd=4.0, dgrad=3.0, wgrad=2.0)
    layers = []
    # A discriminator's FIRST layer only needs an input gradient on the
    # gen-update fake chain (the real input is data; the disc-update fake is
    # stop_gradient'ed), and XLA prunes the dead dgrads.
    first = dict(mult, dgrad=1.0)
    # MPD: wav folded to (T/p, p); convs (5,1) stride (3,1) -> the period
    # axis multiplies positions, channel dims are the matmul dims.
    for p in (2, 3, 5, 7, 11):
        pos = (SEGMENT + (-SEGMENT) % p) // p * p  # total 2D positions
        cin = 1
        for ch in (32, 128, 512, 1024):
            pos_out = math.ceil(pos / 3)
            layers += conv_passes(f"mpd{p}.c{ch}", pos_out, 5, cin, ch,
                                  **(first if cin == 1 else mult))
            pos, cin = pos_out, ch
        layers += conv_passes(f"mpd{p}.c1024b", pos, 5, 1024, 1024, **mult)
        layers += conv_passes(f"mpd{p}.out", pos, 3, 1024, 1, **mult)
    # MSD: 3 scales (T, T/2, T/4), grouped convs
    specs = [(128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
             (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
             (1024, 5, 1, 1)]
    for s in range(3):
        pos = SEGMENT // (2 ** s)
        cin = 1
        for ch, k, stride, groups in specs:
            pos_out = math.ceil(pos / stride)
            g = groups if cin % groups == 0 and cin > 1 else 1
            layers += conv_passes(f"msd{s}.c{ch}k{k}", pos_out, k, cin, ch,
                                  groups=g, **(first if cin == 1 else mult))
            pos, cin = pos_out, ch
        layers += conv_passes(f"msd{s}.out", pos, 3, 1024, 1, **mult)
    return layers


def main():
    gen = generator_layers()
    disc = discriminator_layers()
    everything = gen + disc

    def summarize(tag, passes):
        flops = sum(p.flops for p in passes)
        t_occ = sum(p.t for p in passes)           # occupancy + HBM roofline
        t_ideal = flops / PEAK_BF16                # 100%-MFU floor
        occ_w = flops / sum(p.flops / max(p.occupancy, 1e-9) for p in passes)
        hbm_frac = sum(p.t for p in passes if p.t_hbm > p.t_mxu) / t_occ
        print(f"{tag:14s} flops={flops/1e12:6.2f}T  "
              f"t_ideal={t_ideal*1e3:6.2f}ms  t_roofline={t_occ*1e3:6.2f}ms  "
              f"flop-weighted-occupancy={occ_w:5.1%}  "
              f"time-in-HBM-bound-passes={hbm_frac:5.1%}")
        return flops, t_occ

    print(f"batch={BATCH}, segment={SEGMENT}, bf16; "
          f"peak={PEAK_BF16/1e12:.0f} TFLOP/s, HBM={HBM_BW/1e9:.0f} GB/s\n")
    f_gen, t_gen = summarize("generator", gen)
    f_disc, t_disc = summarize("discriminators", disc)
    f_all, t_all = summarize("total", everything)

    mfu_ceiling = f_all / (t_all * PEAK_BF16)
    print(f"\nachievable step time (conv roofline only): {t_all*1e3:.2f} ms")
    print(f"achievable MFU ceiling:                     {mfu_ceiling:.1%}")

    print("\nworst offenders (top 10 by roofline time):")
    for p in sorted(everything, key=lambda p: -p.t)[:10]:
        bound = "HBM" if p.t_hbm > p.t_mxu else "MXU"
        print(f"  {p.name:18s} t={p.t*1e3:6.2f}ms x{p.mult:.0f} "
              f"occ={p.occupancy:5.1%} {bound}-bound "
              f"flops={p.flops/1e9:7.1f}G")


if __name__ == "__main__":
    main()

"""Pallas kernel tests (interpret mode on CPU; compiled path covered by the
TPU benchmark)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from everyvoice_tpu.dsp.spectral import (
    dynamic_range_compression,
    get_spectral_transform,
)
from everyvoice_tpu.ops.mel_pallas import fused_log_mel

SR = 22050


class TestFusedLogMel:
    @pytest.mark.parametrize("n_samples", [256 * 100, 256 * 200])
    def test_matches_xla_path(self, n_samples):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((2, n_samples)) * 0.3).astype(np.float32)
        mel_fn = get_spectral_transform(
            "mel-librosa", 1024, 1024, 256, SR, 80, 0, 8000
        )
        ref = np.asarray(
            jax.jit(lambda a: dynamic_range_compression(mel_fn(a)))(
                jnp.asarray(x)
            )
        )
        out = np.asarray(fused_log_mel(jnp.asarray(x), interpret=True))
        assert out.shape == ref.shape == (2, 80, n_samples // 256 + 1)
        assert np.abs(out - ref).max() < 1e-4

    def test_speech_like_signal(self):
        t = np.arange(SR) / SR
        x = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, :]
        x = x[:, : (x.shape[1] // 256) * 256]
        mel_fn = get_spectral_transform(
            "mel-librosa", 1024, 1024, 256, SR, 80, 0, 8000
        )
        ref = np.asarray(dynamic_range_compression(mel_fn(jnp.asarray(x))))
        out = np.asarray(fused_log_mel(jnp.asarray(x), interpret=True))
        assert np.abs(out - ref).max() < 1e-4


class TestFusedMRF:
    """The fused MRF stage kernel must match the flax ResBlock1 loop."""

    def _reference_mrf(self, gen_cfg, x, rngkey):
        """Run just the MRF part via small flax modules."""
        import flax.linen as nn

        from everyvoice_tpu.models.hifigan.model import ResBlock1

        class MRF(nn.Module):
            channels: int
            kernels: tuple
            dils: tuple

            @nn.compact
            def __call__(self, x):
                acc = None
                for k, ds in zip(self.kernels, self.dils):
                    y = ResBlock1(self.channels, k, tuple(ds))(x)
                    acc = y if acc is None else acc + y
                return acc / len(self.kernels)

        mod = MRF(x.shape[-1], gen_cfg["kernels"], gen_cfg["dils"])
        params = mod.init(rngkey, x)
        return mod, params, mod.apply(params, x)

    def test_matches_flax_resblocks(self):
        from everyvoice_tpu.ops.mrf_pallas import fused_mrf, weight_norm_kernel

        rng = np.random.default_rng(0)
        b, t, c = 2, 800, 32
        cfg = {"kernels": (3, 7, 11), "dils": ((1, 3, 5),) * 3}
        x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
        mod, params, want = self._reference_mrf(cfg, x, jax.random.PRNGKey(0))

        weights, biases = [], []
        p = params["params"]
        for r in range(3):
            block = p[f"ResBlock1_{r}"]
            for u in range(6):
                kern = weight_norm_kernel(
                    block[f"Conv_{u}"]["kernel"],
                    block[f"WeightNorm_{u}"][f"Conv_{u}/kernel/scale"],
                )
                weights.append(kern.reshape(-1, c))
                biases.append(block[f"Conv_{u}"]["bias"][None, :])
        got = fused_mrf(
            x, tuple(weights), tuple(biases),
            kernel_sizes=cfg["kernels"], dilation_sizes=cfg["dils"],
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_edge_padding_matches_on_multiple_tiles(self):
        """Time axis that doesn't divide the tile exercises padding + the
        per-conv zero-masking at sequence edges."""
        from everyvoice_tpu.ops import mrf_pallas
        from everyvoice_tpu.ops.mrf_pallas import fused_mrf, weight_norm_kernel

        rng = np.random.default_rng(1)
        b, t, c = 1, 1000, 8
        cfg = {"kernels": (3, 7), "dils": ((1, 3), (1, 3))}
        x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
        mod, params, want = self._reference_mrf(cfg, x, jax.random.PRNGKey(1))

        weights, biases = [], []
        p = params["params"]
        for r in range(2):
            block = p[f"ResBlock1_{r}"]
            for u in range(4):
                kern = weight_norm_kernel(
                    block[f"Conv_{u}"]["kernel"],
                    block[f"WeightNorm_{u}"][f"Conv_{u}/kernel/scale"],
                )
                weights.append(kern.reshape(-1, c))
                biases.append(block[f"Conv_{u}"]["bias"][None, :])
        # Force several small tiles so halo handling is exercised.
        orig = mrf_pallas._pick_tile
        mrf_pallas._pick_tile = lambda t_, c_: 256
        try:
            got = fused_mrf(
                x, tuple(weights), tuple(biases),
                kernel_sizes=cfg["kernels"], dilation_sizes=cfg["dils"],
                interpret=True,
            )
        finally:
            mrf_pallas._pick_tile = orig
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )


class TestFusedGenerator:
    def test_matches_flax_generator(self):
        from everyvoice_tpu.models.hifigan.model import HiFiGANGenerator
        from everyvoice_tpu.ops.mrf_pallas import fused_generator_apply

        gen = HiFiGANGenerator(
            upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
            upsample_initial_channel=32,
            resblock_kernel_sizes=(3, 7),
            resblock_dilation_sizes=((1, 3), (1, 3)),
        )
        rng = np.random.default_rng(2)
        mel = jnp.asarray(rng.standard_normal((2, 24, 80)).astype(np.float32))
        params = gen.init(jax.random.PRNGKey(2), mel)
        want = gen.apply(params, mel)
        got = fused_generator_apply(gen, params, mel, interpret=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_matches_flax_istft_generator(self):
        from everyvoice_tpu.models.hifigan.model import HiFiGANGenerator
        from everyvoice_tpu.ops.mrf_pallas import fused_generator_apply

        gen = HiFiGANGenerator(
            upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
            upsample_initial_channel=32,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
            istft_layer=True, istft_n_fft=16, istft_hop=4,
        )
        rng = np.random.default_rng(3)
        mel = jnp.asarray(rng.standard_normal((1, 16, 80)).astype(np.float32))
        params = gen.init(jax.random.PRNGKey(3), mel)
        want = gen.apply(params, mel)
        got = fused_generator_apply(gen, params, mel, interpret=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

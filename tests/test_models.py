"""Model tests: FastSpeech2 + HiFiGAN shapes, alignment invariants, configs
(model: reference everyvoice/tests/test_model.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from everyvoice_tpu.models.fs2 import FastSpeech2, FastSpeech2Config
from everyvoice_tpu.models.fs2.alignment import (
    binarization_loss,
    durations_from_hard_attention,
    forward_sum_loss,
    phone_average,
    viterbi_alignment,
)
from everyvoice_tpu.models.fs2.loss import compute_fs2_losses
from everyvoice_tpu.models.hifigan import (
    HiFiGANConfig,
    HiFiGANGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)

CONTACT = {"contact_name": "Test Runner", "contact_email": "info@everyvoice.ca"}
B, N, T, M = 2, 16, 80, 80


@pytest.fixture(scope="module")
def fs2_setup():
    model = FastSpeech2(n_symbols=40, max_frames=T, enc_layers=1, dec_layers=1)
    rng = jax.random.PRNGKey(0)
    text = jax.random.randint(rng, (B, N), 0, 40)
    tl = jnp.asarray([N, N - 6])
    mel = jax.random.normal(rng, (B, T, M))
    ml = jnp.asarray([T, T - 20])
    pitch = jax.random.normal(rng, (B, T))
    energy = jax.random.normal(rng, (B, T))
    prior = jnp.ones((B, T, N)) / N
    kwargs = dict(
        mel=mel, mel_lengths=ml, attn_prior=prior, pitch=pitch, energy=energy,
    )
    params = model.init({"params": rng, "dropout": rng}, text, tl, **kwargs)
    return model, params, text, tl, kwargs


class TestFastSpeech2:
    def test_train_forward_shapes(self, fs2_setup):
        model, params, text, tl, kwargs = fs2_setup
        out = model.apply(params, text, tl, **kwargs)
        assert out["mel"].shape == (B, T, M)
        assert out["postnet_mel"].shape == (B, T, M)
        assert out["log_duration_prediction"].shape == (B, N)
        assert out["attn_soft"].shape == (B, T, N)

    def test_losses_finite(self, fs2_setup):
        model, params, text, tl, kwargs = fs2_setup
        out = model.apply(params, text, tl, **kwargs)
        batch = {
            "mel": kwargs["mel"], "text_lengths": tl,
            "mel_lengths": kwargs["mel_lengths"],
            "pitch": kwargs["pitch"], "energy": kwargs["energy"],
        }
        losses = compute_fs2_losses(out, batch, {}, learn_alignment=True)
        for name, val in losses.items():
            assert np.isfinite(float(val)), f"{name} not finite"

    def test_inference_no_mel_needed(self, fs2_setup):
        model, params, text, tl, _ = fs2_setup
        out = model.apply(params, text, tl)
        assert out["postnet_mel"].shape == (B, T, M)
        assert "attn_soft" not in out

    def test_duration_control_scales(self, fs2_setup):
        model, params, text, tl, _ = fs2_setup

        # Bias the duration head so predictions are nonzero.
        import flax

        p = flax.core.unfreeze(params)
        p["params"]["duration_predictor"]["Dense_0"]["bias"] = (
            p["params"]["duration_predictor"]["Dense_0"]["bias"] + 1.5
        )
        out1 = model.apply(p, text, tl, duration_control=1.0)
        out2 = model.apply(p, text, tl, duration_control=2.0)
        d1 = np.asarray(out1["duration_used"]).sum()
        d2 = np.asarray(out2["duration_used"]).sum()
        assert d2 >= 1.8 * d1 > 0

    def test_multispeaker_multilingual(self):
        model = FastSpeech2(
            n_symbols=40, max_frames=T, enc_layers=1, dec_layers=1,
            multispeaker=True, multilingual=True, n_speakers=3, n_langs=2,
        )
        rng = jax.random.PRNGKey(1)
        text = jax.random.randint(rng, (B, N), 0, 40)
        tl = jnp.asarray([N, N])
        params = model.init(
            {"params": rng, "dropout": rng}, text, tl,
            speaker_id=jnp.asarray([0, 2]), language_id=jnp.asarray([0, 1]),
        )
        out0 = model.apply(params, text, tl, speaker_id=jnp.asarray([0, 0]),
                           language_id=jnp.asarray([0, 0]))
        out1 = model.apply(params, text, tl, speaker_id=jnp.asarray([1, 1]),
                           language_id=jnp.asarray([0, 0]))
        assert not np.allclose(
            np.asarray(out0["postnet_mel"]), np.asarray(out1["postnet_mel"])
        )

    def test_pfs_input(self):
        model = FastSpeech2(
            n_symbols=40, max_frames=T, enc_layers=1, dec_layers=1,
            use_phonological_feats=True,
        )
        rng = jax.random.PRNGKey(2)
        pfs = jax.random.normal(rng, (B, N, 43))
        tl = jnp.asarray([N, N])
        params = model.init({"params": rng, "dropout": rng}, pfs, tl)
        out = model.apply(params, pfs, tl)
        assert out["postnet_mel"].shape == (B, T, M)

    def test_from_config(self):
        cfg = FastSpeech2Config(contact=CONTACT)
        model = FastSpeech2.from_config(cfg, n_symbols=100)
        assert model.dim == 256
        assert model.enc_layers == 4
        assert model.learn_alignment is True
        assert model.max_frames == 1000


class TestAlignment:
    def test_viterbi_covers_all_frames_and_phones(self):
        rng = jax.random.PRNGKey(3)
        lp = jax.random.normal(rng, (2, 50, 10))
        hard = viterbi_alignment(lp, jnp.asarray([10, 6]), jnp.asarray([50, 25]))
        d = np.asarray(durations_from_hard_attention(hard))
        assert d[0].sum() == 50 and d[1].sum() == 25
        assert (d[0] > 0).all()
        assert (d[1, :6] > 0).all() and (d[1, 6:] == 0).all()
        # Monotone path: one phone per frame, non-decreasing
        path = np.asarray(hard[0]).argmax(-1)
        assert (np.diff(path) >= 0).all()

    def test_forward_sum_decreases_for_diagonal(self):
        # A perfectly diagonal log-prob should score better than uniform.
        T_, N_ = 40, 10
        diag = np.full((1, T_, N_), -10.0, np.float32)
        for t in range(T_):
            diag[0, t, min(t * N_ // T_, N_ - 1)] = 0.0
        uniform = np.zeros((1, T_, N_), np.float32)
        l_diag = float(forward_sum_loss(jnp.asarray(diag), jnp.asarray([N_]), jnp.asarray([T_])))
        l_unif = float(forward_sum_loss(jnp.asarray(uniform), jnp.asarray([N_]), jnp.asarray([T_])))
        assert l_diag < l_unif

    def test_phone_average(self):
        vals = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        hard = jnp.asarray([[[1, 0], [1, 0], [0, 1], [0, 1]]], dtype=jnp.float32)
        avg = np.asarray(phone_average(vals, hard))
        assert np.allclose(avg, [[1.5, 3.5]])

    def test_binarization_loss_zero_for_matching(self):
        hard = jax.nn.one_hot(jnp.asarray([[0, 0, 1, 2]]), 3)
        assert float(binarization_loss(hard, hard)) < 1e-5


class TestHiFiGAN:
    def test_generator_exact_upsampling(self):
        rng = jax.random.PRNGKey(0)
        mel = jax.random.normal(rng, (1, 20, 80))
        gen = HiFiGANGenerator()
        wav = gen.apply(gen.init(rng, mel), mel)
        assert wav.shape == (1, 20 * 256)

    def test_istft_variant_exact_upsampling(self):
        rng = jax.random.PRNGKey(0)
        mel = jax.random.normal(rng, (1, 20, 80))
        gen = HiFiGANGenerator(
            upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16), istft_layer=True,
        )
        wav = gen.apply(gen.init(rng, mel), mel)
        assert wav.shape == (1, 20 * 256)

    @pytest.mark.slow
    def test_discriminators(self):
        rng = jax.random.PRNGKey(0)
        wav = jax.random.normal(rng, (2, 8192))
        mpd = MultiPeriodDiscriminator()
        scores, feats = mpd.apply(mpd.init(rng, wav), wav)
        assert len(scores) == 5 and len(feats) == 5
        msd = MultiScaleDiscriminator()
        scores2, feats2 = msd.apply(msd.init(rng, wav), wav)
        assert len(scores2) == 3

    def test_msd_first_scale_is_spectrally_normalized(self):
        """The raw-audio MSD scale must bound its effective kernels to unit
        spectral norm (HiFi-GAN applies spectral norm to scale 0 only)."""
        import numpy as np

        from everyvoice_tpu.models.hifigan.model import (
            ScaleDiscriminator,
            SpectralNormConv,
        )

        rng = jax.random.PRNGKey(3)
        x = jax.random.normal(rng, (1, 256, 8))
        conv = SpectralNormConv(16, kernel_size=5)
        params = conv.init(rng, x)
        kernel = np.asarray(params["params"]["kernel"])
        sigma = np.linalg.svd(
            kernel.reshape(-1, kernel.shape[-1]), compute_uv=False
        )[0]
        # Recover the effective kernel the module convolves with (probe with
        # the identity trick: outputs of unit impulses), and check its
        # largest singular value is ~1. The stateless power iteration
        # slightly underestimates sigma_max, so allow a small overshoot.
        y = conv.apply(params, x)
        scaled = jax.lax.conv_general_dilated(
            x, jnp.asarray(kernel) / sigma, (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + params["params"]["bias"]
        ratio = np.asarray(y - params["params"]["bias"]) / np.maximum(
            np.abs(np.asarray(scaled - params["params"]["bias"])), 1e-6
        ) * np.sign(np.asarray(scaled - params["params"]["bias"]))
        # All elements share one scale factor sigma_true/sigma_est >= 1
        factors = ratio[np.abs(np.asarray(scaled)) > 0.1]
        assert np.all(factors > 0.999), factors.min()
        assert np.all(factors < 1.10), factors.max()
        assert np.std(factors) < 1e-3  # a single uniform scale, not noise

        # Scale 0 of the MSD carries SpectralNormConv params; scales 1-2
        # stay weight-normed.
        wav = jax.random.normal(rng, (1, 4096))
        sd0 = ScaleDiscriminator(use_spectral_norm=True)
        p0 = sd0.init(rng, wav)
        flat_names = jax.tree_util.tree_leaves_with_path(p0)
        assert any(
            "SpectralNormConv" in jax.tree_util.keystr(path)
            for path, _ in flat_names
        )
        sd0.apply(p0, wav)

    def test_config_hop_validation(self):
        with pytest.raises(Exception, match="upsample"):
            HiFiGANConfig(
                contact=CONTACT, model={"upsample_rates": [8, 8, 2]},
            )
        cfg = HiFiGANConfig(contact=CONTACT)
        gen = HiFiGANGenerator.from_config(cfg)
        assert gen.upsample_rates == (8, 8, 2, 2)

    def test_istft_config_derivation(self):
        cfg = HiFiGANConfig(
            contact=CONTACT,
            model={"istft_layer": True, "upsample_rates": [8, 8],
                   "upsample_kernel_sizes": [16, 16]},
        )
        gen = HiFiGANGenerator.from_config(cfg)
        assert gen.istft_hop == 4 and gen.istft_n_fft == 16


class TestModelConfigs:
    def test_contact_required(self):
        with pytest.raises(Exception, match="contact"):
            FastSpeech2Config()

    def test_checkpoint_dump_json_safe(self):
        import json

        cfg = FastSpeech2Config(contact=CONTACT)
        json.dumps(cfg.model_checkpoint_dump())
        cfg2 = HiFiGANConfig(contact=CONTACT)
        json.dumps(cfg2.model_checkpoint_dump())

"""StyleTTS2 model-family tests: config parity, module shapes, stage-1
training step, diffusion sampling, inference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from everyvoice_tpu.models.styletts2.config import (
    StyleTTS2Config,
    StyleTTS2LossConfig,
)
from everyvoice_tpu.models.styletts2.model import (
    StyleTTS2Module,
    sample_style_diffusion,
)

CONTACT = {"contact_name": "Test Runner", "contact_email": "info@everyvoice.ca"}


def tiny_module():
    return StyleTTS2Module(
        n_symbols=50, hidden_dim=64, style_dim=32, max_frames=64,
        upsample_rates=(8, 8), diff_layers=1, diff_heads=2,
        diff_head_features=16,
    )


@pytest.fixture(scope="module")
def tiny_setup():
    m = tiny_module()
    rng = jax.random.PRNGKey(0)
    B, N, T = 2, 12, 64
    tokens = jax.random.randint(rng, (B, N), 0, 50)
    tl = jnp.asarray([12, 9])
    ref_mel = jax.random.normal(rng, (B, T, 80))
    dur = jnp.full((B, N), 4, jnp.int32)
    f0 = jnp.abs(jax.random.normal(rng, (B, T))) * 100 + 100
    en = jax.random.normal(rng, (B, T))
    params = m.init(
        {"params": rng, "dropout": rng, "noise": rng},
        tokens, tl, ref_mel, durations=dur, f0_frames=f0, energy_frames=en,
    )
    return m, params, (tokens, tl, ref_mel, dur, f0, en)


class TestConfig:
    def test_schema_field_parity(self):
        import json
        from pathlib import Path

        ref = json.loads(
            Path(
                "/root/reference/everyvoice/.schema/everyvoice-text-to-wav-0.5.json"
            ).read_text()
        )
        mine = StyleTTS2Config.model_json_schema()
        assert set(ref["properties"]) <= set(mine["properties"])
        # spot-check pinned hyperparameters
        cfg = StyleTTS2Config(contact=CONTACT)
        assert cfg.model.style_dim == 128
        assert cfg.model.hidden_dim == 512
        assert cfg.model.decoder.gen_istft_n_fft == 16
        assert cfg.training.epochs_1st == 200
        assert cfg.training.losses.lambda_ce == 20.0
        assert cfg.model.diffusion.dist.sigma_data == 0.2

    def test_loss_weights_complete(self):
        lc = StyleTTS2LossConfig()
        for name in ("lambda_mel", "lambda_gen", "lambda_slm", "lambda_mono",
                     "lambda_s2s", "lambda_f0", "lambda_norm", "lambda_dur",
                     "lambda_ce", "lambda_sty", "lambda_diff"):
            assert hasattr(lc, name)


class TestModule:
    def test_forward_shapes(self, tiny_setup):
        m, params, (tokens, tl, ref_mel, dur, f0, en) = tiny_setup
        out = m.apply(
            params, tokens, tl, ref_mel,
            durations=dur, f0_frames=f0, energy_frames=en,
        )
        B, T = ref_mel.shape[:2]
        assert out["wav"].shape == (B, T * 256)
        assert out["duration_logits"].shape == (B, tokens.shape[1], 50)
        assert out["acoustic_style"].shape == (B, 32)
        assert np.isfinite(np.asarray(out["wav"])).all()

    def test_inference_without_teacher_inputs(self, tiny_setup):
        m, params, (tokens, tl, ref_mel, *_rest) = tiny_setup
        out = m.apply(params, tokens, tl, ref_mel)
        assert out["wav"].shape[1] == m.max_frames * 256

    def test_diffusion_sampling(self, tiny_setup):
        m, params, (tokens, tl, *_rest) = tiny_setup
        mask = jnp.ones_like(tokens, dtype=bool)
        emb = m.apply(params, tokens, mask, method="text_context_embedding")

        def denoiser(noisy, sigma, e):
            return m.apply(params, noisy, sigma, e, method="denoise_style")

        style = sample_style_diffusion(
            denoiser, jax.random.PRNGKey(1), emb, 64, steps=3,
        )
        assert style.shape == (2, 64)
        assert np.isfinite(np.asarray(style)).all()
        # embedding_scale path (classifier-free guidance)
        style2 = sample_style_diffusion(
            denoiser, jax.random.PRNGKey(1), emb, 64, steps=3,
            embedding_scale=2.0,
        )
        assert not np.allclose(np.asarray(style), np.asarray(style2))


class TestComputePrecision:
    """bf16 conv compute for the waveform-scale hot path (decoder MRF
    stack, style encoders) — params, losses, LSTMs, phase accumulation,
    and the iSTFT head stay float32. No reference equivalent (its
    Lightning trainers train full 32-bit)."""

    def test_bf16_forward_tracks_f32_with_shared_params(self, tiny_setup):
        m32, params, (tokens, tl, ref_mel, dur, f0, en) = tiny_setup
        m16 = StyleTTS2Module(
            n_symbols=50, hidden_dim=64, style_dim=32, max_frames=64,
            upsample_rates=(8, 8), diff_layers=1, diff_heads=2,
            diff_head_features=16, compute_dtype="bfloat16",
        )
        # compute dtype never changes the parameter structure or dtype
        p16 = m16.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0),
             "noise": jax.random.PRNGKey(0)},
            tokens, tl, ref_mel, durations=dur, f0_frames=f0, energy_frames=en,
        )
        assert jax.tree.structure(p16) == jax.tree.structure(params)
        assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(p16))
        kw = dict(durations=dur, f0_frames=f0, energy_frames=en)
        out32 = m32.apply(params, tokens, tl, ref_mel, **kw)
        out16 = m16.apply(params, tokens, tl, ref_mel, **kw)
        wav32 = np.asarray(out32["wav"])
        wav16 = np.asarray(out16["wav"])
        assert wav16.dtype == np.float32  # iSTFT head stays f32
        rms = np.sqrt(np.mean(wav32**2)) + 1e-9
        # Same function, reduced mantissa: close but not bit-equal.
        assert np.sqrt(np.mean((wav32 - wav16) ** 2)) / rms < 0.2
        corr = np.corrcoef(wav32.ravel(), wav16.ravel())[0, 1]
        assert corr > 0.98
        # Style vectors (float32 heads) also track.
        s32 = np.asarray(out32["acoustic_style"])
        s16 = np.asarray(out16["acoustic_style"])
        assert s16.dtype == np.float32
        assert np.corrcoef(s32.ravel(), s16.ravel())[0, 1] > 0.98

    def test_trainer_on_cpu_mesh_resolves_float32(self):
        from everyvoice_tpu.utils.precision import resolve_compute_dtype

        cpu = jax.devices("cpu")[0]
        assert resolve_compute_dtype("auto", cpu) == "float32"
        assert resolve_compute_dtype("bfloat16", cpu) == "bfloat16"


@pytest.mark.slow
class TestStage1Training:
    def test_one_training_step(self, lj_corpus, tmp_path):
        """Stage-1 GAN step over real preprocessed LJ data."""
        from everyvoice_tpu.dataloader import StyleTTS2Dataset
        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
        from everyvoice_tpu.parallel import make_mesh
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        fs2_config, save_dir = lj_corpus
        config = StyleTTS2Config(
            contact=CONTACT,
            model={
                "hidden_dim": 64, "style_dim": 32, "max_dur": 20,
                "decoder": {
                    "upsample_initial_channel": 32,
                    "resblock_kernel_sizes": [3],
                    "resblock_dilation_sizes": [[1, 3]],
                    "mpd_layers": [2], "msd_layers": 1,
                },
                "diffusion": {"transformer": {"num_layers": 1, "num_heads": 2,
                                              "head_features": 16}},
            },
            preprocessing=fs2_config.preprocessing.model_dump(),
            text=fs2_config.text.model_dump(),
        )
        config.preprocessing.save_dir = save_dir
        config.training.training_filelist = save_dir / "training_filelist.psv"
        config.training.validation_filelist = (
            save_dir / "validation_filelist.psv"
        )
        config.training.batch_size = 2
        config.training.max_len = 128  # keep the CPU-mesh test fast
        train = generic_psv_filelist_reader(config.training.training_filelist)
        ds = StyleTTS2Dataset(train, config)
        assert len(ds) > 0
        mesh = make_mesh(jax.devices("cpu")[:2])
        trainer = StyleTTS2Trainer(
            config, ds, ds, mesh=mesh, run_dir=tmp_path, mode="first",
        )
        gen_params, disc_params = trainer.fit(max_steps=1, log_every=1)
        assert (tmp_path / "checkpoints" / "stage-1-last.ckpt").exists()
        from everyvoice_tpu.train import load_checkpoint_header

        header = load_checkpoint_header(tmp_path / "checkpoints" / "stage-1-last.ckpt")
        assert header["model_info"]["name"] == "StyleTTS2Module"
        assert header["stage"] == "first"

    def test_segment_clip_training_step(self, lj_corpus, tmp_path):
        """Random-clip GAN training (decoder_segment_frames < max_len):
        the decoder/discriminator losses run on a per-utterance clip — the
        published StyleTTS2 recipe's behavior and the round-5 step-time
        optimization (tools/styletts2_component_times.py). The step must
        run, produce finite losses, and actually decode clip-sized
        waveforms."""
        import numpy as np

        from everyvoice_tpu.dataloader import StyleTTS2Dataset
        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
        from everyvoice_tpu.parallel import make_mesh
        from everyvoice_tpu.train.loop import training_rng
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        fs2_config, save_dir = lj_corpus
        config = StyleTTS2Config(
            contact=CONTACT,
            model={
                "hidden_dim": 64, "style_dim": 32, "max_dur": 20,
                "decoder": {
                    "upsample_initial_channel": 32,
                    "resblock_kernel_sizes": [3],
                    "resblock_dilation_sizes": [[1, 3]],
                    "mpd_layers": [2], "msd_layers": 1,
                },
                "diffusion": {"transformer": {"num_layers": 1,
                                              "num_heads": 2,
                                              "head_features": 16}},
            },
            preprocessing=fs2_config.preprocessing.model_dump(),
            text=fs2_config.text.model_dump(),
        )
        config.preprocessing.save_dir = save_dir
        config.training.training_filelist = save_dir / "training_filelist.psv"
        config.training.validation_filelist = (
            save_dir / "validation_filelist.psv"
        )
        config.training.batch_size = 2
        config.training.max_len = 128
        config.training.decoder_segment_frames = 32
        train = generic_psv_filelist_reader(config.training.training_filelist)
        ds = StyleTTS2Dataset(train, config)
        mesh = make_mesh(jax.devices("cpu")[:2])
        trainer = StyleTTS2Trainer(
            config, ds, ds, mesh=mesh, run_dir=tmp_path, mode="first",
        )
        assert trainer.model.segment_frames == 32
        trainer.build_steps()
        batch = next(ds.batches(2, shuffle=False))
        batch.pop("basenames", None)
        gen_params, disc_params = trainer.init_params(batch)
        gen_opt = trainer.gen_opt.init(gen_params)
        disc_opt = trainer.disc_opt.init(disc_params)
        (gen_params, disc_params, gen_opt, disc_opt, metrics,
         _) = trainer._train_step(
            gen_params, disc_params, gen_opt, disc_opt, batch,
            training_rng(0), None, trainer.phase_weights(0),
            ood_active=False, tma_active=False,
        )
        assert np.isfinite(float(metrics["gen/total"]))
        assert np.isfinite(float(metrics["disc/total"]))
        # The decoded waveform really is clip-sized: decode through the
        # module with explicit starts.
        hop = config.preprocessing.audio.fft_hop_size
        out = trainer.model.apply(
            gen_params,
            jnp.asarray(batch["text"]), jnp.asarray(batch["text_lengths"]),
            jnp.asarray(batch["mel"]),
            durations=jnp.asarray(batch["durations"]),
            f0_frames=jnp.asarray(batch["f0_frames"]),
            energy_frames=jnp.asarray(batch["energy_frames"]),
            mel_lengths=jnp.asarray(batch["mel_lengths"]),
            segment_starts=jnp.zeros((2,), jnp.int32),
        )
        assert out["wav"].shape[1] == 32 * hop

    def test_segments_disabled_when_max_len_too_small(self, lj_corpus):
        """decoder_segment_frames >= max_len must fall back to full-length
        decoding (the pre-round-5 behavior) rather than a zero-range clip."""
        from everyvoice_tpu.models.styletts2.model import StyleTTS2Module

        fs2_config, save_dir = lj_corpus
        config = StyleTTS2Config(
            contact=CONTACT,
            preprocessing=fs2_config.preprocessing.model_dump(),
            text=fs2_config.text.model_dump(),
        )
        config.training.max_len = 128  # < default segment of 320
        module = StyleTTS2Module.from_config(config, n_symbols=10)
        assert module.segment_frames is None


def _tiny_torch_wavlm(tmp_path):
    """Random-init tiny HF WavLM saved locally (no network): exercises the
    exact local-directory loading path users take with real
    microsoft/wavlm-base-plus weights."""
    torch = pytest.importorskip("torch")
    from transformers import WavLMConfig, WavLMModel

    cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16,) * 7,
        num_buckets=32, max_bucket_distance=80,
        num_conv_pos_embeddings=15, num_conv_pos_embedding_groups=4,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    model = WavLMModel(cfg).eval()
    path = tmp_path / "wavlm-tiny"
    model.save_pretrained(path)
    return model, path


@pytest.mark.slow
class TestWavLM:
    def test_numerical_parity_with_torch(self, tmp_path):
        """The flax WavLM reproduces transformers.WavLMModel hidden states
        on converted weights — so real wavlm-base-plus checkpoints load
        correctly (reference styletts2 SLM, schema slm section)."""
        torch = pytest.importorskip("torch")
        from everyvoice_tpu.models.styletts2.slm import (
            WavLM,
            convert_torch_wavlm_state,
        )

        torch_model, _ = _tiny_torch_wavlm(tmp_path)
        wav = np.random.default_rng(0).standard_normal((2, 3200)).astype(
            np.float32
        )
        with torch.no_grad():
            t_hs = [
                h.numpy()
                for h in torch_model(
                    torch.from_numpy(wav), output_hidden_states=True
                ).hidden_states
            ]
        flax_model = WavLM(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            conv_dim=(16,) * 7, num_buckets=32, max_distance=80,
            num_conv_pos_embeddings=15, num_conv_pos_embedding_groups=4,
        )
        params = convert_torch_wavlm_state(torch_model.state_dict(), 2)
        f_hs = flax_model.apply(
            jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(wav)
        )
        assert len(f_hs) == len(t_hs) == 3
        for i, (a, b) in enumerate(zip(t_hs, f_hs)):
            np.testing.assert_allclose(
                a, np.asarray(b), rtol=1e-3, atol=1e-4,
                err_msg=f"hidden state {i}",
            )

    def test_bf16_features_close_to_f32(self):
        """The frozen WavLM tower runs in bf16 inside the stage-2 train step
        on TPU (train.py slm_feats); its stacked features must stay close to
        the f32 reference — adversarial losses tolerate this error band."""
        from everyvoice_tpu.models.styletts2.slm import (
            WavLM,
            stack_hidden_states,
        )

        model = WavLM(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            conv_dim=(16,) * 7, num_buckets=32, max_distance=80,
            num_conv_pos_embeddings=15, num_conv_pos_embedding_groups=4,
        )
        wav = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 3200)),
            jnp.float32,
        )
        params = model.init(jax.random.PRNGKey(0), wav)
        f32 = stack_hidden_states(model.apply(params, wav))
        p16 = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16)
            if jnp.issubdtype(t.dtype, jnp.floating) else t,
            params,
        )
        b16 = stack_hidden_states(
            model.apply(p16, wav.astype(jnp.bfloat16))
        ).astype(jnp.float32)
        denom = float(jnp.mean(jnp.abs(f32))) + 1e-8
        rel = float(jnp.mean(jnp.abs(f32 - b16))) / denom
        assert rel < 0.05, f"bf16 WavLM feature drift too large: {rel:.4f}"

    def test_discriminator_head(self):
        from everyvoice_tpu.models.styletts2.slm import (
            SLMDiscriminator,
            slm_discriminator_loss,
            slm_generator_loss,
        )

        head = SLMDiscriminator(initial_channel=8)
        feats = jnp.ones((2, 16, 96))
        params = head.init(jax.random.PRNGKey(0), feats)
        scores = head.apply(params, feats)
        assert scores.shape == (2, 16)
        assert np.isfinite(float(slm_generator_loss(scores)))
        assert np.isfinite(float(slm_discriminator_loss(scores, scores)))


@pytest.mark.slow
class TestStage2SLMTraining:
    def test_stage2_with_slm(self, lj_corpus, tmp_path):
        """Stage-2 training with SLM-adversarial losses enabled through a
        locally staged WavLM directory."""
        pytest.importorskip("torch")
        import json

        from everyvoice_tpu.dataloader import StyleTTS2Dataset
        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
        from everyvoice_tpu.parallel import make_mesh
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        _, wavlm_dir = _tiny_torch_wavlm(tmp_path)
        fs2_config, save_dir = lj_corpus
        config = StyleTTS2Config(
            contact=CONTACT,
            model={
                "hidden_dim": 64, "style_dim": 32, "max_dur": 20,
                "slm": {"model": str(wavlm_dir), "hidden": 32, "nlayers": 3,
                        "initial_channel": 8},
                "decoder": {
                    "upsample_initial_channel": 32,
                    "resblock_kernel_sizes": [3],
                    "resblock_dilation_sizes": [[1, 3]],
                    "mpd_layers": [2], "msd_layers": 1,
                },
                "diffusion": {"transformer": {"num_layers": 1, "num_heads": 2,
                                              "head_features": 16}},
            },
            preprocessing=fs2_config.preprocessing.model_dump(),
            text=fs2_config.text.model_dump(),
        )
        config.preprocessing.save_dir = save_dir
        config.training.training_filelist = save_dir / "training_filelist.psv"
        config.training.validation_filelist = (
            save_dir / "validation_filelist.psv"
        )
        config.training.batch_size = 2
        config.training.max_len = 128
        train = generic_psv_filelist_reader(config.training.training_filelist)
        ds = StyleTTS2Dataset(train, config)
        mesh = make_mesh(jax.devices("cpu")[:2])
        trainer = StyleTTS2Trainer(
            config, ds, ds, mesh=mesh, run_dir=tmp_path / "run", mode="second",
        )
        assert trainer.slm_head is not None, "SLM should be enabled"
        trainer.fit(max_steps=1, log_every=1)
        records = [
            json.loads(line)
            for line in (tmp_path / "run" / "metrics.jsonl")
            .read_text()
            .splitlines()
        ]
        rec = next(
            r for r in reversed(records) if "training/gen/slm" in r
        )
        assert np.isfinite(rec["training/gen/slm"])
        assert np.isfinite(rec["training/disc/slm"])
        # A validation record exists too (top-k ranks on held-out loss now).
        assert any("validation/total" in r for r in records)

    def test_stage2_slm_sees_ood_text(self, lj_corpus, tmp_path):
        """The slmadv path: with ood/<lang>.psv staged and joint_epoch
        reached, the SLM generator and discriminator losses include
        OOD-text synthesis terms (reference preprocessor.py:1242-1321 +
        SURVEY §2.5)."""
        pytest.importorskip("torch")
        import json

        from everyvoice_tpu.dataloader import StyleTTS2Dataset
        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
        from everyvoice_tpu.parallel import make_mesh
        from everyvoice_tpu.utils import (
            generic_psv_filelist_reader,
            write_filelist,
        )

        _, wavlm_dir = _tiny_torch_wavlm(tmp_path)
        fs2_config, save_dir = lj_corpus
        config = StyleTTS2Config(
            contact=CONTACT,
            model={
                "hidden_dim": 64, "style_dim": 32, "max_dur": 20,
                "slm": {"model": str(wavlm_dir), "hidden": 32, "nlayers": 3,
                        "initial_channel": 8},
                "decoder": {
                    "upsample_initial_channel": 32,
                    "resblock_kernel_sizes": [3],
                    "resblock_dilation_sizes": [[1, 3]],
                    "mpd_layers": [2], "msd_layers": 1,
                },
                "diffusion": {"transformer": {"num_layers": 1, "num_heads": 2,
                                              "head_features": 16}},
            },
            preprocessing=fs2_config.preprocessing.model_dump(),
            text=fs2_config.text.model_dump(),
        )
        config.preprocessing.save_dir = save_dir
        config.training.training_filelist = save_dir / "training_filelist.psv"
        config.training.validation_filelist = (
            save_dir / "validation_filelist.psv"
        )
        config.training.batch_size = 2
        config.training.max_len = 128
        # slmadv active from the first epoch
        config.training.losses.joint_epoch = 0
        config.training.losses.diff_epoch = 0
        # Stage OOD sentences as `preprocess -s ood` would.
        ood_dir = save_dir / "ood"
        ood_dir.mkdir(exist_ok=True)
        write_filelist(
            [{"text": "an out of domain sentence"},
             {"text": "another unseen line of text"}],
            ood_dir / "eng.psv",
        )
        train = generic_psv_filelist_reader(config.training.training_filelist)
        ds = StyleTTS2Dataset(train, config)
        mesh = make_mesh(jax.devices("cpu")[:2])
        trainer = StyleTTS2Trainer(
            config, ds, ds, mesh=mesh, run_dir=tmp_path / "run2",
            mode="second",
        )
        trainer.fit(max_steps=1, log_every=1)
        records = [
            json.loads(line)
            for line in (tmp_path / "run2" / "metrics.jsonl")
            .read_text()
            .splitlines()
        ]
        rec = next(
            r for r in reversed(records) if "training/gen/slm_ood" in r
        )
        assert np.isfinite(rec["training/gen/slm_ood"])
        assert np.isfinite(rec["training/disc/slm_ood"])


class TestRecipeSchedule:
    """The schema's tma/diff/joint epoch schedule is consumed
    (everyvoice-text-to-wav-0.5.json tma_epoch/diff_epoch/joint_epoch)."""

    def _trainer(self, lj_corpus, tmp_path, mode):
        from everyvoice_tpu.dataloader import StyleTTS2Dataset
        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
        from everyvoice_tpu.parallel import make_mesh
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        fs2_config, save_dir = lj_corpus
        config = StyleTTS2Config(
            contact=CONTACT,
            model={"hidden_dim": 32, "style_dim": 16, "max_dur": 20,
                   "decoder": {"upsample_initial_channel": 32,
                               "resblock_kernel_sizes": [3],
                               "resblock_dilation_sizes": [[1, 3]],
                               "mpd_layers": [2], "msd_layers": 1},
                   "diffusion": {"transformer": {"num_layers": 1,
                                                 "num_heads": 2,
                                                 "head_features": 8}}},
            preprocessing=fs2_config.preprocessing.model_dump(),
            text=fs2_config.text.model_dump(),
        )
        config.preprocessing.save_dir = save_dir
        config.training.training_filelist = save_dir / "training_filelist.psv"
        config.training.validation_filelist = (
            save_dir / "validation_filelist.psv"
        )
        train = generic_psv_filelist_reader(config.training.training_filelist)
        ds = StyleTTS2Dataset(train, config)
        return StyleTTS2Trainer(
            config, ds, ds, mesh=make_mesh(jax.devices("cpu")[:2]),
            run_dir=tmp_path / "sched", mode=mode,
        )

    def test_stage1_phases(self, lj_corpus, tmp_path):
        trainer = self._trainer(lj_corpus, tmp_path, "first")
        tma = trainer.config.training.losses.tma_epoch
        assert list(np.asarray(trainer.phase_weights(0))) == [0.0, 0.0, 0.0]
        assert list(np.asarray(trainer.phase_weights(tma))) == [1.0, 0.0, 0.0]

    def test_stage2_phases(self, lj_corpus, tmp_path):
        trainer = self._trainer(lj_corpus, tmp_path, "second")
        losses = trainer.config.training.losses
        assert list(np.asarray(trainer.phase_weights(0))) == [1.0, 0.0, 0.0]
        assert list(
            np.asarray(trainer.phase_weights(losses.diff_epoch))
        ) == [1.0, 1.0, 0.0]
        assert list(
            np.asarray(trainer.phase_weights(losses.joint_epoch))
        ) == [1.0, 1.0, 1.0]


class TestFirstStagePickup:
    """Stage 2's automatic stage-1 checkpoint pickup
    (training.first_stage_path, reference regression-test.sh:102-104)."""

    def test_resolves_across_timestamped_sibling_runs(self, tmp_path):
        """The default relative path resolves against sibling runs of the
        same experiment (each run gets a fresh timestamped sub_dir), newest
        first."""
        import os
        import types

        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer

        config = StyleTTS2Config(contact=CONTACT)
        config.training.logger.save_dir = tmp_path / "logs"
        lc = config.training.logger
        version_dir = tmp_path / "logs" / lc.name / lc.version
        older = version_dir / "2020-01-01_00-00-00" / "checkpoints"
        newer = version_dir / "2020-01-02_00-00-00" / "checkpoints"
        for d in (older, newer):
            d.mkdir(parents=True)
            (d / "stage-1-last.ckpt").write_bytes(b"stub")
        os.utime(older / "stage-1-last.ckpt", (1.0, 1.0))
        shim = types.SimpleNamespace(
            run_dir=version_dir / "2020-01-03_00-00-00",
            training_config=config.training,
        )
        found = StyleTTS2Trainer._resolve_first_stage_path(
            shim, config.training.first_stage_path
        )
        assert found == newer / "stage-1-last.ckpt"

    def test_explicit_and_run_dir_paths_win(self, tmp_path):
        import types

        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer

        config = StyleTTS2Config(contact=CONTACT)
        config.training.logger.save_dir = tmp_path / "logs"
        run_dir = tmp_path / "run"
        (run_dir / "checkpoints").mkdir(parents=True)
        local = run_dir / "checkpoints" / "stage-1-last.ckpt"
        local.write_bytes(b"stub")
        shim = types.SimpleNamespace(
            run_dir=run_dir, training_config=config.training
        )
        found = StyleTTS2Trainer._resolve_first_stage_path(
            shim, config.training.first_stage_path
        )
        assert found == local
        # absolute path used verbatim
        absolute = tmp_path / "elsewhere.ckpt"
        absolute.write_bytes(b"stub")
        assert (
            StyleTTS2Trainer._resolve_first_stage_path(shim, absolute)
            == absolute
        )
        # nothing anywhere -> None (stage 2 trains from scratch with a
        # warning)
        assert (
            StyleTTS2Trainer._resolve_first_stage_path(
                shim, tmp_path / "missing.ckpt"
            )
            is None
        )

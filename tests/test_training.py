"""End-to-end training tests on the CPU mesh: FS2 + HiFiGAN short runs,
checkpointing, resume (model: the reference's Slurm regression pipeline,
tests/regression/regression-test.sh, shrunk to CI scale)."""

from pathlib import Path

import numpy as np
import pytest

import jax

from everyvoice_tpu.dataloader import FastSpeech2Dataset, HiFiGANDataset
from everyvoice_tpu.models.hifigan import HiFiGANConfig
from everyvoice_tpu.parallel import make_mesh
from everyvoice_tpu.text.lookups import lookuptables_from_data
from everyvoice_tpu.train import (
    FastSpeech2Trainer,
    HiFiGANTrainer,
    inspect_checkpoint,
    load_checkpoint,
    load_checkpoint_header,
    rename_speaker,
    save_checkpoint,
)
from everyvoice_tpu.utils import generic_psv_filelist_reader

CONTACT = {"contact_name": "Test Runner", "contact_email": "info@everyvoice.ca"}


def small_hifigan_config(fs2_config) -> HiFiGANConfig:
    cfg = HiFiGANConfig(
        contact=CONTACT,
        model={
            "upsample_rates": [8, 8, 2, 2],
            "upsample_kernel_sizes": [16, 16, 4, 4],
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
            "mpd_layers": [2, 3],
            "msd_layers": 2,
        },
        preprocessing=fs2_config.preprocessing.model_dump(),
    )
    cfg.preprocessing.save_dir = fs2_config.preprocessing.save_dir
    cfg.preprocessing.audio.vocoder_segment_size = 4096
    cfg.training.training_filelist = fs2_config.training.training_filelist
    cfg.training.validation_filelist = fs2_config.training.validation_filelist
    return cfg


@pytest.fixture(scope="module")
def cpu_mesh():
    return make_mesh(jax.devices("cpu")[:4])


@pytest.mark.slow
class TestFS2Training:
    @pytest.fixture(scope="class")
    def trained(self, lj_corpus, cpu_mesh, tmp_path_factory):
        config, save_dir = lj_corpus
        config = config.model_copy(deep=True)
        config.training.batch_size = 4
        config.training.val_check_interval = 4
        config.training.save_top_k_ckpts = 2
        run_dir = tmp_path_factory.mktemp("fs2_run")
        train = generic_psv_filelist_reader(config.training.training_filelist)
        val = generic_psv_filelist_reader(config.training.validation_filelist)
        lang2id, speaker2id = lookuptables_from_data((train, val))
        ds = FastSpeech2Dataset(train, config, lang2id, speaker2id)
        vds = FastSpeech2Dataset(val, config, lang2id, speaker2id,
                                 text_processor=ds.text_processor)
        trainer = FastSpeech2Trainer(
            config, ds, vds, lang2id, speaker2id, mesh=cpu_mesh, run_dir=run_dir,
        )
        params = trainer.fit(max_steps=6, log_every=1)
        return trainer, params, run_dir

    def test_checkpoints_written(self, trained):
        trainer, params, run_dir = trained
        ckpts = list((run_dir / "checkpoints").glob("*.ckpt"))
        assert (run_dir / "checkpoints" / "last.ckpt").exists()
        assert len(ckpts) >= 2  # last + at least one top-k

    def test_metrics_logged(self, trained):
        import json

        trainer, params, run_dir = trained
        lines = [
            json.loads(line)
            for line in (run_dir / "metrics.jsonl").read_text().splitlines()
        ]
        assert any("training/total" in rec for rec in lines)
        assert any("validation/total" in rec for rec in lines)
        for rec in lines:
            for key, value in rec.items():
                if key.startswith(("training/", "validation/")):
                    assert np.isfinite(value), f"{key} not finite"

    def test_checkpoint_contract(self, trained):
        trainer, params, run_dir = trained
        header = load_checkpoint_header(run_dir / "checkpoints" / "last.ckpt")
        assert header["model_info"]["name"] == "FastSpeech2"
        hp = header["hyper_parameters"]
        assert "config" in hp and "lang2id" in hp and "speaker2id" in hp
        import json

        json.dumps(header)  # JSON-safe end to end

    def test_resume_from_checkpoint(self, trained, cpu_mesh, tmp_path_factory, lj_corpus):
        trainer, params, run_dir = trained
        config, _ = lj_corpus
        config = config.model_copy(deep=True)
        config.training.batch_size = 4
        config.training.finetune_checkpoint = run_dir / "checkpoints" / "last.ckpt"
        run_dir2 = tmp_path_factory.mktemp("fs2_resume")
        trainer2 = FastSpeech2Trainer(
            config, trainer.dataset, trainer.val_dataset,
            trainer.lang2id, trainer.speaker2id, mesh=cpu_mesh, run_dir=run_dir2,
        )
        trainer2.build_steps()
        p0 = trainer2.init_params()
        restored, opt = trainer2.load_finetune_checkpoint(p0)
        assert trainer2.global_step == trainer.global_step
        # restored weights differ from a fresh init (training moved them)
        a = jax.tree.leaves(restored)[0]
        b = jax.tree.leaves(p0)[0]
        assert a.shape == np.asarray(b).shape

    def test_resume_blocked_on_architecture_diff(
        self, trained, cpu_mesh, tmp_path_factory, lj_corpus
    ):
        """Reference base_cli/helpers.py:318-330: changing the model
        architecture between pre-training and fine-tuning is a hard error."""
        from everyvoice_tpu.exceptions import InvalidConfiguration

        trainer, params, run_dir = trained
        config, _ = lj_corpus
        config = config.model_copy(deep=True)
        config.training.batch_size = 4
        config.training.finetune_checkpoint = run_dir / "checkpoints" / "last.ckpt"
        config.model.encoder.layers += 1
        trainer2 = FastSpeech2Trainer(
            config, trainer.dataset, trainer.val_dataset,
            trainer.lang2id, trainer.speaker2id, mesh=cpu_mesh,
            run_dir=tmp_path_factory.mktemp("fs2_archdiff"),
        )
        trainer2.build_steps()
        p0 = trainer2.init_params()
        with pytest.raises(InvalidConfiguration, match="architecture"):
            trainer2.load_finetune_checkpoint(p0)

    def test_resume_restarts_optimizer_on_optimizer_diff(
        self, trained, cpu_mesh, tmp_path_factory, lj_corpus
    ):
        """Reference base_cli/helpers.py:340-358: an optimizer
        hyperparameter change keeps the weights but restarts optimizer
        state and the step/epoch counters."""
        trainer, params, run_dir = trained
        config, _ = lj_corpus
        config = config.model_copy(deep=True)
        config.training.batch_size = 4
        config.training.finetune_checkpoint = run_dir / "checkpoints" / "last.ckpt"
        config.training.optimizer.learning_rate = (
            config.training.optimizer.learning_rate * 0.5
        )
        trainer2 = FastSpeech2Trainer(
            config, trainer.dataset, trainer.val_dataset,
            trainer.lang2id, trainer.speaker2id, mesh=cpu_mesh,
            run_dir=tmp_path_factory.mktemp("fs2_optdiff"),
        )
        trainer2.build_steps()
        p0 = trainer2.init_params()
        restored, opt = trainer2.load_finetune_checkpoint(p0)
        assert opt is None  # fresh optimizer
        assert trainer2.global_step == 0  # counters restart
        assert jax.tree.leaves(restored)[0].shape == np.asarray(
            jax.tree.leaves(p0)[0]
        ).shape

    def test_inference_after_training(self, trained):
        import jax.numpy as jnp

        trainer, params, run_dir = trained
        batch = next(trainer.dataset.batches(2, shuffle=False))
        out = trainer.model.apply(
            params,
            jnp.asarray(batch["text"]),
            jnp.asarray(batch["text_lengths"]),
        )
        assert np.isfinite(np.asarray(out["postnet_mel"])).all()


class TestTinyDatasetBatches:
    def test_drop_last_smaller_than_batch_yields_one(self, lj_corpus):
        """A non-empty dataset smaller than one batch must still produce a
        (duplicate-padded) batch with drop_last — a zero-batch epoch spins
        the training loop forever."""
        config, _ = lj_corpus
        train = generic_psv_filelist_reader(config.training.training_filelist)
        lang2id, speaker2id = lookuptables_from_data((train,))
        ds = FastSpeech2Dataset(train, config, lang2id, speaker2id)
        assert 0 < len(ds) < 64
        batches = list(ds.batches(64, shuffle=True, seed=0, drop_last=True))
        assert len(batches) == 1
        assert batches[0]["text"].shape[0] == 64

    def test_hifigan_segment_batches_smaller_than_batch(self, lj_corpus):
        config, _ = lj_corpus
        hcfg = small_hifigan_config(config)
        train = generic_psv_filelist_reader(hcfg.training.training_filelist)
        ds = HiFiGANDataset(train, hcfg)
        assert 0 < len(ds) < 64
        seg = hcfg.preprocessing.audio.vocoder_segment_size
        batches = list(ds.segment_batches(64, seg, drop_last=True))
        assert len(batches) == 1
        assert batches[0]["audio"].shape == (64, seg)

    def test_empty_dataset_raises(self, lj_corpus, cpu_mesh, tmp_path):
        config, _ = lj_corpus
        config = config.model_copy(deep=True)
        lang2id, speaker2id = {}, {}
        ds = FastSpeech2Dataset([], config, lang2id, speaker2id)
        trainer = FastSpeech2Trainer(
            config, ds, ds, lang2id, speaker2id, mesh=cpu_mesh,
            run_dir=tmp_path,
        )
        with pytest.raises(RuntimeError, match="empty"):
            trainer.fit(max_steps=1, log_every=1)


@pytest.mark.slow
class TestStepsPerExecution:
    """steps_per_execution scans K optimizer steps inside one jitted
    dispatch; the parameter trajectory must match per-step execution."""

    def _fit(self, lj_corpus, cpu_mesh, run_dir, spe):
        config, _ = lj_corpus
        config = config.model_copy(deep=True)
        config.training.batch_size = 2
        config.training.val_check_interval = 100
        train = generic_psv_filelist_reader(config.training.training_filelist)
        val = generic_psv_filelist_reader(config.training.validation_filelist)
        lang2id, speaker2id = lookuptables_from_data((train, val))
        ds = FastSpeech2Dataset(train, config, lang2id, speaker2id)
        vds = FastSpeech2Dataset(val, config, lang2id, speaker2id,
                                 text_processor=ds.text_processor)
        trainer = FastSpeech2Trainer(
            config, ds, vds, lang2id, speaker2id, mesh=cpu_mesh,
            run_dir=run_dir,
        )
        params = trainer.fit(max_steps=4, log_every=2, steps_per_execution=spe)
        return trainer, params

    def test_matches_single_step(self, lj_corpus, cpu_mesh, tmp_path_factory):
        t1, p1 = self._fit(lj_corpus, cpu_mesh,
                           tmp_path_factory.mktemp("spe1"), 1)
        t2, p2 = self._fit(lj_corpus, cpu_mesh,
                           tmp_path_factory.mktemp("spe2"), 2)
        assert t1.global_step == t2.global_step == 4
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            )

    def test_leftover_batches_run_single(self, lj_corpus, cpu_mesh,
                                         tmp_path_factory):
        # spe larger than the batches per epoch: everything goes through
        # the single-step leftover path and training still completes.
        trainer, params = self._fit(
            lj_corpus, cpu_mesh, tmp_path_factory.mktemp("spe_big"), 64
        )
        assert trainer.global_step == 4
        assert np.isfinite(np.asarray(jax.tree.leaves(params)[0])).all()


@pytest.mark.slow
class TestHiFiGANTraining:
    def test_short_gan_run(self, lj_corpus, cpu_mesh, tmp_path_factory):
        config, save_dir = lj_corpus
        hcfg = small_hifigan_config(config)
        hcfg.training.batch_size = 2
        hcfg.training.val_check_interval = 3
        run_dir = tmp_path_factory.mktemp("hfg_run")
        train = generic_psv_filelist_reader(hcfg.training.training_filelist)
        val = generic_psv_filelist_reader(hcfg.training.validation_filelist)
        ds = HiFiGANDataset(train, hcfg)
        vds = HiFiGANDataset(val, hcfg)
        assert len(ds) > 0
        trainer = HiFiGANTrainer(hcfg, ds, vds, mesh=cpu_mesh, run_dir=run_dir)
        gen_params, disc_params = trainer.fit(max_steps=3, log_every=1)
        assert (run_dir / "checkpoints" / "last.ckpt").exists()
        header = load_checkpoint_header(run_dir / "checkpoints" / "last.ckpt")
        assert header["model_info"]["name"] == "HiFiGAN"
        # generator output is finite audio
        import jax.numpy as jnp

        batch = next(ds.batches(2, shuffle=False))
        wav = trainer.generator.apply(
            gen_params, jnp.asarray(batch["mel"][:, :32])
        )
        assert np.isfinite(np.asarray(wav)).all()

        # Resume goes through the same config-diff gate as FS2
        # (reference base_cli/helpers.py:278-375 applies it to every model):
        # unchanged config → full resume restores step counters and both
        # optimizer states.
        hcfg2 = hcfg.model_copy(deep=True)
        hcfg2.training.finetune_checkpoint = run_dir / "checkpoints" / "last.ckpt"
        trainer2 = HiFiGANTrainer(
            hcfg2, ds, vds, mesh=cpu_mesh,
            run_dir=tmp_path_factory.mktemp("hfg_resume"),
        )
        gp2, dp2 = trainer2.fit(max_steps=4, log_every=1)
        assert trainer2.global_step >= 4
        # an architecture diff is a hard error
        from everyvoice_tpu.exceptions import InvalidConfiguration

        hcfg3 = hcfg2.model_copy(deep=True)
        hcfg3.model.upsample_initial_channel = (
            hcfg3.model.upsample_initial_channel * 2
        )
        trainer3 = HiFiGANTrainer(
            hcfg3, ds, vds, mesh=cpu_mesh,
            run_dir=tmp_path_factory.mktemp("hfg_archdiff"),
        )
        with pytest.raises(InvalidConfiguration, match="architecture"):
            trainer3.fit(max_steps=1, log_every=1)


class TestCheckpointTools:
    def test_save_load_roundtrip(self, tmp_path):
        params = {"dense": {"kernel": np.ones((4, 4), np.float32)}}
        path = save_checkpoint(
            tmp_path / "m.ckpt", "FastSpeech2", {"a": 1}, params,
            step=10, lang2id={"eng": 0}, speaker2id={"spk": 0},
            stats={"pitch": {"mean": 1.0}},
        )
        ckpt = load_checkpoint(path)
        assert ckpt["global_step"] == 10
        assert np.array_equal(
            ckpt["state_dict"]["dense"]["kernel"], params["dense"]["kernel"]
        )

    def test_inspect(self, tmp_path):
        params = {"dense": {"kernel": np.ones((4, 4), np.float32)}}
        path = save_checkpoint(tmp_path / "m.ckpt", "HiFiGAN", {"x": 2}, params)
        text = inspect_checkpoint(path, show_architecture=True)
        assert "HiFiGAN" in text
        assert "16" in text  # 4x4 param count

    def test_rename_speaker(self, tmp_path):
        params = {"w": np.zeros(3, np.float32)}
        path = save_checkpoint(
            tmp_path / "m.ckpt", "FastSpeech2", {}, params,
            speaker2id={"old": 0, "other": 1},
        )
        out = tmp_path / "renamed.ckpt"
        rename_speaker(path, "old", "new", out)
        header = load_checkpoint_header(out)
        assert header["hyper_parameters"]["speaker2id"] == {"other": 1, "new": 0}
        with pytest.raises(ValueError, match="not found"):
            rename_speaker(path, "nope", "x", tmp_path / "y.ckpt")

    def test_newer_format_version_rejected(self, tmp_path):
        """A checkpoint from a future major format errors with an upgrade
        message (reference tests/test_model.py:392-460)."""
        import json as json_mod
        import struct

        params = {"w": np.zeros(3, np.float32)}
        path = save_checkpoint(tmp_path / "m.ckpt", "FastSpeech2", {}, params)
        raw = path.read_bytes()
        (header_len,) = struct.unpack("<Q", raw[4:12])
        header = json_mod.loads(raw[12:12 + header_len])
        header["model_info"]["version"] = "2.0"
        new_header = json_mod.dumps(header).encode()
        future = tmp_path / "future.ckpt"
        future.write_bytes(
            raw[:4] + struct.pack("<Q", len(new_header)) + new_header
            + raw[12 + header_len:]
        )
        with pytest.raises(ValueError, match="upgrade"):
            load_checkpoint_header(future)
        with pytest.raises(ValueError, match="upgrade"):
            load_checkpoint(future)

    def test_missing_format_version_accepted(self, tmp_path):
        """Version-less checkpoints (oldest format) still load."""
        import json as json_mod
        import struct

        params = {"w": np.zeros(3, np.float32)}
        path = save_checkpoint(tmp_path / "m.ckpt", "FastSpeech2", {}, params)
        raw = path.read_bytes()
        (header_len,) = struct.unpack("<Q", raw[4:12])
        header = json_mod.loads(raw[12:12 + header_len])
        del header["model_info"]["version"]
        new_header = json_mod.dumps(header).encode()
        old = tmp_path / "old.ckpt"
        old.write_bytes(
            raw[:4] + struct.pack("<Q", len(new_header)) + new_header
            + raw[12 + header_len:]
        )
        assert load_checkpoint(old)["model_info"]["name"] == "FastSpeech2"

    def test_wrong_model_type_rejected(self, tmp_path):
        """Loading a vocoder checkpoint as a feature-prediction model errors
        cleanly (reference tests/test_model.py:178-316)."""
        from everyvoice_tpu.models.fs2.synthesize import (
            load_fs2_from_checkpoint,
        )

        params = {"w": np.zeros(3, np.float32)}
        path = save_checkpoint(tmp_path / "v.ckpt", "HiFiGAN", {}, params)
        with pytest.raises(ValueError, match="FastSpeech2"):
            load_fs2_from_checkpoint(path)


class TestTopKRetention:
    def test_worse_than_topk_is_never_written(self, tmp_path):
        """A checkpoint that would be evicted immediately must not be
        written at all — saving it and unlinking races the async writer
        thread (the unlink lands before the file exists and the file
        leaks on disk forever)."""
        from types import SimpleNamespace

        from everyvoice_tpu.train.loop import TrainerBase

        tr = TrainerBase.__new__(TrainerBase)
        tr.training_config = SimpleNamespace(save_top_k_ckpts=2)
        tr.ckpt_dir = tmp_path
        tr.config = {}
        tr.model_name = "FastSpeech2"
        tr.epoch = 0
        tr._topk = []
        params = {"w": np.zeros(2, np.float32)}
        for step, metric in [(1, 1.0), (2, 2.0), (3, 3.0), (4, 0.5)]:
            tr.global_step = step
            tr.maybe_checkpoint(metric, params, None)
        tr.wait_for_checkpoints()
        kept = sorted(p.name for p in tmp_path.glob("epoch=*.ckpt"))
        # top-2 of {1.0, 2.0, 3.0, 0.5} = {0.5, 1.0}; the 3.0 checkpoint
        # was never written, and the 2.0 one was evicted and removed.
        assert kept == [
            "epoch=0-step=1-loss=1.0000.ckpt",
            "epoch=0-step=4-loss=0.5000.ckpt",
        ]
        assert (tmp_path / "last.ckpt").exists()
        assert [m for m, _ in tr._topk] == [0.5, 1.0]


@pytest.mark.slow
class TestLegacyDurations:
    """learn_alignment=False consumes pre-extracted duration/ artifacts
    (the retired DFAligner's output; reference preprocessor.py:644-651)."""

    def test_training_with_duration_artifacts(self, lj_corpus, cpu_mesh,
                                              tmp_path_factory):
        import numpy as np

        config, save_dir = lj_corpus
        config = config.model_copy(deep=True)
        config.model.learn_alignment = False
        config.training.batch_size = 2
        # Synthesize plausible duration artifacts: uniform frames per token.
        dur_dir = Path(save_dir) / "duration"
        dur_dir.mkdir(exist_ok=True)
        train = generic_psv_filelist_reader(config.training.training_filelist)
        from everyvoice_tpu.dataloader import FastSpeech2Dataset

        l2i, s2i = lookuptables_from_data((train, train))
        probe = FastSpeech2Dataset(train, config, l2i, s2i)
        for i in range(len(probe)):
            item = probe.items[i]
            ids = probe._token_ids(item)
            spec = np.load(probe._path(item, "spec", probe._spec_name()),
                           mmap_mode="r")
            n_frames = spec.shape[1]
            base = n_frames // max(len(ids), 1)
            dur = np.full(len(ids), base, np.int32)
            dur[-1] += n_frames - dur.sum()
            np.save(probe._path(item, "duration", "duration.npy"), dur)
        ds = FastSpeech2Dataset(train, config, l2i, s2i,
                                text_processor=probe.text_processor)
        batch = next(ds.batches(2, shuffle=False))
        assert "durations" in batch
        assert "attn_prior" not in batch
        run_dir = tmp_path_factory.mktemp("fs2_legacy")
        trainer = FastSpeech2Trainer(
            config, ds, ds, l2i, s2i, mesh=cpu_mesh, run_dir=run_dir,
        )
        trainer.fit(max_steps=1, log_every=1)
        assert (run_dir / "checkpoints" / "last.ckpt").exists()


@pytest.mark.slow
class TestISTFTNetTraining:
    """iSTFTNet variant end to end (BASELINE config #3)."""

    def test_istft_vocoder_short_run(self, lj_corpus, cpu_mesh, tmp_path_factory):
        config, save_dir = lj_corpus
        hcfg = small_hifigan_config(config)
        hcfg.model.istft_layer = True
        hcfg.model.upsample_rates = [8, 8]
        hcfg.model.upsample_kernel_sizes = [16, 16]
        hcfg.training.batch_size = 2
        run_dir = tmp_path_factory.mktemp("istft_run")
        train = generic_psv_filelist_reader(hcfg.training.training_filelist)
        ds = HiFiGANDataset(train, hcfg)
        trainer = HiFiGANTrainer(hcfg, ds, ds, mesh=cpu_mesh, run_dir=run_dir)
        gen_params, _ = trainer.fit(max_steps=1, log_every=1)
        assert trainer.generator.istft_layer
        import jax.numpy as jnp

        batch = next(ds.batches(2, shuffle=False))
        wav = trainer.generator.apply(gen_params, jnp.asarray(batch["mel"][:, :16]))
        assert wav.shape == (2, 16 * 256)
        assert np.isfinite(np.asarray(wav)).all()


@pytest.mark.slow
class TestObservability:
    """LR monitoring + TensorBoard media summaries (the reference's
    LearningRateMonitor and vocoder-gated audio logging, SURVEY.md §5)."""

    def test_learning_rate_at_noam_peak(self):
        from everyvoice_tpu.config.shared_types import (
            AdamWOptimizer,
            NoamOptimizer,
        )
        from everyvoice_tpu.train.optim import learning_rate_at

        noam = NoamOptimizer(learning_rate=1e-3, warmup_steps=100)
        # Peak (= the configured learning_rate) lands at the warmup boundary.
        peak = max(learning_rate_at(noam, s) for s in range(0, 300))
        assert abs(peak - 1e-3) / 1e-3 < 1e-9
        assert learning_rate_at(noam, 10) < peak
        assert learning_rate_at(noam, 10000) < peak
        assert learning_rate_at(AdamWOptimizer(learning_rate=2e-4), 5) == 2e-4

    def test_writer_audio_and_image_records(self, tmp_path):
        import struct

        from everyvoice_tpu.train.tensorboard import SummaryWriter, mel_to_image

        writer = SummaryWriter(tmp_path)
        audio = np.sin(np.linspace(0, 40 * np.pi, 4000)).astype(np.float32)
        writer.add_audio("val/audio", audio, 22050, step=3)
        mel = np.random.default_rng(0).standard_normal((120, 80))
        writer.add_mel("val/mel", mel, step=3)
        writer.flush()
        data = writer.path.read_bytes()
        assert b"val/audio" in data
        assert b"audio/wav" in data
        assert b"RIFF" in data  # embedded WAV bytes
        assert b"val/mel" in data
        assert b"\x89PNG" in data  # embedded PNG bytes
        # TFRecord framing intact: walk every record.
        pos, records = 0, 0
        while pos < len(data):
            (length,) = struct.unpack("<Q", data[pos : pos + 8])
            pos += 12 + length + 4
            records += 1
        assert pos == len(data)
        assert records == 3  # file-version + audio + image

    def test_mel_image_shape_and_range(self):
        from everyvoice_tpu.train.tensorboard import mel_to_image

        mel = np.random.default_rng(1).standard_normal((50, 80))
        img = mel_to_image(mel)
        assert img.shape == (80, 50, 3)
        assert img.dtype == np.uint8

    def test_fit_logs_lr_and_validation_media(self, trained):
        import json

        trainer, params, run_dir = trained
        lines = [
            json.loads(line)
            for line in (run_dir / "metrics.jsonl").read_text().splitlines()
        ]
        assert any("training/lr" in rec for rec in lines)
        events = list(run_dir.glob("events.out.tfevents.*"))
        assert events
        blob = events[0].read_bytes()
        assert b"validation/mel_predicted" in blob
        assert b"validation/mel_target" in blob


# make the shared fixture visible to TestObservability
TestObservability.trained = TestFS2Training.trained


@pytest.mark.slow
class TestVocoderAudioLogging:
    def test_validation_audio_logged_with_vocoder_path(
        self, lj_corpus, cpu_mesh, tmp_path_factory
    ):
        """training.vocoder_path enables vocoded audio summaries during
        validation (reference docs/guides/fastspeech2.md:53)."""
        from model_stubs import get_dummy_hifigan_checkpoint

        config, save_dir = lj_corpus
        config = config.model_copy(deep=True)
        config.training.batch_size = 4
        config.training.val_check_interval = 2
        ckpt_dir = tmp_path_factory.mktemp("voc_ckpt")
        config.training.vocoder_path = get_dummy_hifigan_checkpoint(ckpt_dir)
        run_dir = tmp_path_factory.mktemp("fs2_audio_run")
        train = generic_psv_filelist_reader(config.training.training_filelist)
        val = generic_psv_filelist_reader(config.training.validation_filelist)
        lang2id, speaker2id = lookuptables_from_data((train, val))
        ds = FastSpeech2Dataset(train, config, lang2id, speaker2id)
        vds = FastSpeech2Dataset(val, config, lang2id, speaker2id,
                                 text_processor=ds.text_processor)
        trainer = FastSpeech2Trainer(
            config, ds, vds, lang2id, speaker2id, mesh=cpu_mesh,
            run_dir=run_dir,
        )
        trainer.fit(max_steps=2, log_every=1)
        blob = next(run_dir.glob("events.out.tfevents.*")).read_bytes()
        assert b"validation/audio_predicted" in blob
        assert b"RIFF" in blob

class TestResumeGateUnits:
    def test_changed_config_values_ignores_additions(self):
        from everyvoice_tpu.train.checkpoint import (
            changed_config_values,
            resume_mode,
        )

        old = {"model": {"dim": 256, "old_only": 1}, "training": {}}
        new = {"model": {"dim": 256, "new_only": 2}, "training": {}}
        assert changed_config_values(old, new) == []
        assert resume_mode(old, new, "FastSpeech2") == "full"
        # StyleTTS2 skips the gate even with an arch diff (two-stage recipe)
        old_diff = {"model": {"dim": 128}}
        assert resume_mode(old_diff, new, "StyleTTS2Module") == "full"

    def test_arch_diff_raises(self):
        from everyvoice_tpu.exceptions import InvalidConfiguration
        from everyvoice_tpu.train.checkpoint import resume_mode

        old = {"model": {"dim": 256}, "training": {"optimizer": {"lr": 1e-4}}}
        new = {"model": {"dim": 512}, "training": {"optimizer": {"lr": 1e-4}}}
        with pytest.raises(InvalidConfiguration, match="architecture"):
            resume_mode(old, new, "FastSpeech2")

    def test_optimizer_diff_restarts(self):
        from everyvoice_tpu.train.checkpoint import resume_mode

        old = {"model": {"dim": 256}, "training": {"optimizer": {"lr": 1e-4}}}
        new = {"model": {"dim": 256}, "training": {"optimizer": {"lr": 5e-5}}}
        assert resume_mode(old, new, "FastSpeech2") == "fresh_optimizer"


@pytest.mark.slow
class TestFSDPTraining:
    def test_fs2_short_run_with_fsdp(self, lj_corpus, tmp_path_factory):
        """--strategy fsdp end to end: a short FastSpeech2 run with ZeRO-3
        parameter/optimizer sharding trains to finite losses and writes
        checkpoints that load back."""
        from everyvoice_tpu.text.lookups import lookuptables_from_data

        config, save_dir = lj_corpus
        config = config.model_copy(deep=True)
        config.training.batch_size = 4
        config.training.val_check_interval = 100
        run_dir = tmp_path_factory.mktemp("fs2_fsdp_run")
        train = generic_psv_filelist_reader(config.training.training_filelist)
        val = generic_psv_filelist_reader(config.training.validation_filelist)
        lang2id, speaker2id = lookuptables_from_data((train, val))
        ds = FastSpeech2Dataset(train, config, lang2id, speaker2id)
        vds = FastSpeech2Dataset(val, config, lang2id, speaker2id,
                                 text_processor=ds.text_processor)
        mesh = make_mesh(jax.devices("cpu")[:4])
        trainer = FastSpeech2Trainer(
            config, ds, vds, lang2id, speaker2id, mesh=mesh, run_dir=run_dir,
            fsdp=True,
        )
        trainer.fit(max_steps=3, log_every=1)
        assert (run_dir / "checkpoints" / "last.ckpt").exists()
        header = load_checkpoint_header(run_dir / "checkpoints" / "last.ckpt")
        assert header["model_info"]["name"] == "FastSpeech2"
        ckpt = load_checkpoint(run_dir / "checkpoints" / "last.ckpt")
        for leaf in jax.tree_util.tree_leaves(ckpt["state_dict"]):
            assert np.all(np.isfinite(leaf))


class TestValidationPadding:
    """Pad-duplicated rows must never bias the monitored validation loss,
    and the trailing partial batch must reuse the training compile shape."""

    def test_pad_batch_for_eval_shapes_and_weights(self):
        from everyvoice_tpu.parallel.mesh import pad_batch_for_eval

        batch = {"x": np.arange(5, dtype=np.float32).reshape(5, 1),
                 "name": "meta"}
        padded, n_true = pad_batch_for_eval(batch, 4, batch_size=8)
        assert n_true == 5
        assert padded["x"].shape == (8, 1)
        np.testing.assert_array_equal(
            padded["row_weights"], [1, 1, 1, 1, 1, 0, 0, 0]
        )
        np.testing.assert_array_equal(padded["x"][5:, 0], [0, 1, 2])
        assert padded["name"] == "meta"
        # already-full batches just gain all-one weights
        full, n = pad_batch_for_eval({"x": np.zeros((8, 2))}, 4, batch_size=8)
        assert n == 8 and full["x"].shape == (8, 2)
        assert full["row_weights"].sum() == 8

    def test_forward_sum_row_weights_drop_pad_rows(self):
        import jax.numpy as jnp

        from everyvoice_tpu.models.fs2.alignment import forward_sum_loss

        rng = np.random.default_rng(0)
        attn = jnp.asarray(rng.standard_normal((2, 12, 5)), jnp.float32)
        src = jnp.asarray([5, 4])
        mel = jnp.asarray([12, 9])
        base = forward_sum_loss(attn[:1], src[:1], mel[:1])
        # duplicating row 0 as a pad row and 0-weighting it must not change
        # the loss
        dup = jnp.concatenate([attn, attn[:1]], axis=0)
        weighted = forward_sum_loss(
            dup[jnp.asarray([0, 0])], src[jnp.asarray([0, 0])],
            mel[jnp.asarray([0, 0])], row_weights=jnp.asarray([1.0, 0.0]),
        )
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(weighted), rtol=1e-6
        )

    @pytest.mark.slow
    def test_single_eval_compile_with_partial_final_batch(
        self, lj_corpus, cpu_mesh, tmp_path
    ):
        """A val set that does not divide the batch size must produce
        exactly ONE jitted eval compilation:
        the final partial batch is padded to the full batch size."""
        config, save_dir = lj_corpus
        config = config.model_copy(deep=True)
        config.training.batch_size = 3
        train = generic_psv_filelist_reader(config.training.training_filelist)
        lang2id, speaker2id = lookuptables_from_data((train, train))
        ds = FastSpeech2Dataset(train, config, lang2id, speaker2id)
        assert len(ds) % 3 != 0, "fixture should not divide the batch size"
        trainer = FastSpeech2Trainer(
            config, ds, ds, lang2id, speaker2id, mesh=cpu_mesh,
            run_dir=tmp_path,
        )
        trainer.build_steps()
        params = trainer.init_params()
        val = trainer.validate(params)
        assert np.isfinite(val["total"])
        assert trainer._eval_step._cache_size() == 1


class TestComputePrecision:
    """bf16 training compute (train.loop.resolve_compute_dtype + the
    models' compute_dtype knobs — TPU-first mixed precision with float32
    params/losses; no reference equivalent, its Lightning trainers train
    full 32-bit)."""

    def test_resolve_auto_per_platform(self):
        from everyvoice_tpu.train.loop import resolve_compute_dtype

        # On a CPU device 'auto' must keep exact reference numerics; the
        # device matters, not the process's default backend (a CPU mesh on
        # a TPU-attached host still resolves to float32).
        cpu = jax.devices("cpu")[0]
        assert resolve_compute_dtype("auto", cpu) == "float32"
        assert resolve_compute_dtype("bfloat16", cpu) == "bfloat16"
        assert resolve_compute_dtype("float32") == "float32"

    def test_trainer_on_cpu_mesh_resolves_float32(self, lj_corpus, cpu_mesh):
        config, _ = lj_corpus
        train = generic_psv_filelist_reader(config.training.training_filelist)
        lang2id, speaker2id = lookuptables_from_data((train, train))
        ds = FastSpeech2Dataset(train, config, lang2id, speaker2id)
        trainer = FastSpeech2Trainer(
            config, ds, ds, lang2id, speaker2id, mesh=cpu_mesh
        )
        assert trainer.compute_dtype == "float32"
        assert trainer.model.compute_dtype == "float32"

    def test_discriminators_bf16_track_f32(self):
        import jax.numpy as jnp
        from everyvoice_tpu.models.hifigan.model import (
            MultiPeriodDiscriminator,
            MultiScaleDiscriminator,
        )

        rng = jax.random.PRNGKey(0)
        wav = jax.random.normal(jax.random.PRNGKey(1), (2, 512)) * 0.2
        for make in (
            lambda dt: MultiPeriodDiscriminator((2, 3), compute_dtype=dt),
            lambda dt: MultiScaleDiscriminator(2, compute_dtype=dt),
        ):
            m32, m16 = make("float32"), make("bfloat16")
            params = m32.init(rng, wav)
            # params are float32 regardless of compute dtype
            p16 = m16.init(rng, wav)
            assert all(
                x.dtype == jnp.float32 for x in jax.tree.leaves(p16)
            )
            s32, _ = m32.apply(params, wav)
            s16, _ = m16.apply(params, wav)
            for a, b in zip(s32, s16):
                assert b.dtype == jnp.bfloat16
                a = np.asarray(a)
                b = np.asarray(b, np.float32)
                scale = np.abs(a).max() + 1e-9
                assert np.abs(a - b).max() / scale < 0.1

    def test_gan_losses_reduce_in_f32_from_bf16_scores(self):
        import jax.numpy as jnp
        from everyvoice_tpu.models.hifigan.loss import (
            discriminator_loss,
            feature_matching_loss,
            generator_adversarial_loss,
        )

        real = [jnp.ones((2, 8), jnp.bfloat16)]
        fake = [jnp.zeros((2, 8), jnp.bfloat16)]
        feats_r = [[jnp.ones((2, 4, 3), jnp.bfloat16)]]
        feats_f = [[jnp.zeros((2, 4, 3), jnp.bfloat16)]]
        for loss in (
            discriminator_loss(real, fake),
            generator_adversarial_loss(fake),
            feature_matching_loss(feats_r, feats_f),
        ):
            assert loss.dtype == jnp.float32
            assert np.isfinite(float(loss))

    def test_fs2_bf16_forward_tracks_f32(self):
        import jax.numpy as jnp
        from everyvoice_tpu.models.fs2.model import FastSpeech2

        kw = dict(
            n_symbols=20, enc_layers=1, dec_layers=1, dim=32, enc_heads=2,
            dec_heads=2, enc_ff_dim=64, dec_ff_dim=64, vp_layers=1,
            n_mels=16, max_frames=48, learn_alignment=False,
        )
        m32 = FastSpeech2(**kw)
        m16 = FastSpeech2(compute_dtype="bfloat16", **kw)
        text = jnp.asarray([[1, 2, 3, 4, 5, 6, 0, 0]], jnp.int32)
        lengths = jnp.asarray([6], jnp.int32)
        # Pin durations (teacher forcing) so both precisions regulate to the
        # identical frame layout — the comparison then isolates numerics.
        durations = jnp.where(
            jnp.arange(8)[None, :] < 6, 4, 0
        ).astype(jnp.int32)
        kw_call = dict(durations=durations, teacher_forcing=True)
        # eager init: teacher_forcing is python-static control flow
        params = m32.init(jax.random.PRNGKey(0), text, lengths, **kw_call)
        assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(params))
        out32 = m32.apply(params, text, lengths, **kw_call)
        out16 = m16.apply(params, text, lengths, **kw_call)
        mel32 = np.asarray(out32["mel"])
        mel16 = np.asarray(out16["mel"], np.float32)
        assert mel16.dtype == np.float32  # heads stay f32
        # bf16 rounding compounds through LayerNorms and may flip a
        # variance bin, so the bound is loose — what matters is that the
        # two precisions compute the same function, not bit parity.
        rms = np.sqrt(np.mean(mel32**2)) + 1e-9
        assert np.sqrt(np.mean((mel32 - mel16) ** 2)) / rms < 0.15
        corr = np.corrcoef(mel32.ravel(), mel16.ravel())[0, 1]
        assert corr > 0.99

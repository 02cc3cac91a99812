"""Preprocessor tests over the LJSpeech micro-corpus
(model: reference everyvoice/tests/test_preprocessing.py +
tests/preprocessed_audio_fixture.py)."""

import json
from pathlib import Path

import numpy as np
import pytest

from everyvoice_tpu.config import PreprocessingConfig, TextConfig
from everyvoice_tpu.config.preprocessing_config import Dataset
from everyvoice_tpu.config.shared_types import ContactInformation
from everyvoice_tpu.dsp import write_wav
from everyvoice_tpu.models.fs2 import FastSpeech2Config
from everyvoice_tpu.preprocessor import Preprocessor
from everyvoice_tpu.utils import generic_psv_filelist_reader

LJ_DATA = Path("/root/reference/everyvoice/tests/data")
LJ_WAVS = LJ_DATA / "lj" / "wavs"

CONTACT = {"contact_name": "Test Runner", "contact_email": "info@everyvoice.ca"}


def make_config(tmp_path: Path, filelist: Path, data_dir: Path) -> FastSpeech2Config:
    return FastSpeech2Config(
        contact=CONTACT,
        preprocessing=PreprocessingConfig(
            save_dir=tmp_path / "preprocessed",
            source_data=[
                Dataset(
                    label="LJ_TEST",
                    permissions_obtained=True,
                    data_dir=data_dir,
                    filelist=filelist,
                )
            ],
        ),
        text=TextConfig(
            symbols={
                "letters": list("abcdefghijklmnopqrstuvwxyz"),
                "ipa": list("ðʌɛʃɜ˞æɑɔɹɪʊəɡʒŋθaeioubcdfghjklmnpqrstvwxyz"),
            }
        ),
    )


@pytest.fixture(scope="session")
def lj_preprocessed(tmp_path_factory):
    """Preprocess the 10-file LJ snippet once per session
    (analog of the reference's PreprocessedAudioFixture)."""
    tmp_path = tmp_path_factory.mktemp("lj")
    config = make_config(tmp_path, LJ_DATA / "metadata.psv", LJ_WAVS)
    preprocessor = Preprocessor(config)
    preprocessor.preprocess(
        to_process=("audio", "text", "spec", "attn", "energy", "pitch"),
        overwrite=True,
    )
    return preprocessor, config


pytestmark = pytest.mark.skipif(
    not LJ_WAVS.exists(), reason="LJ fixture data unavailable"
)


class TestEndToEndPreprocessing:
    def test_artifacts_exist_with_reference_layout(self, lj_preprocessed):
        pre, config = lj_preprocessed
        save_dir = Path(config.preprocessing.save_dir)
        for folder in ("audio", "spec", "attn", "energy", "pitch"):
            assert (save_dir / folder).is_dir()
        specs = list((save_dir / "spec").glob("*--*--*--spec-22050-mel-librosa.npy"))
        assert len(specs) == 5  # the LJ micro-fixture has 5 wavs
        wavs = list((save_dir / "audio").glob("*--*--*--audio-22050.wav"))
        assert len(wavs) == len(specs)

    def test_frame_alignment_contract(self, lj_preprocessed):
        """spec/energy/pitch must have frames == samples // hop."""
        pre, config = lj_preprocessed
        save_dir = Path(config.preprocessing.save_dir)
        from everyvoice_tpu.dsp import read_wav

        for spec_path in (save_dir / "spec").glob("*.npy"):
            base = spec_path.name.rsplit("--", 1)[0]
            audio, _ = read_wav(save_dir / "audio" / f"{base}--audio-22050.wav")
            n_frames = audio.shape[1] // 256
            spec = np.load(spec_path)
            assert spec.shape == (80, n_frames)
            energy = np.load(save_dir / "energy" / f"{base}--energy.npy")
            pitch = np.load(save_dir / "pitch" / f"{base}--pitch.npy")
            assert energy.shape == (n_frames,)
            assert pitch.shape == (n_frames,)

    def test_stats_normalized(self, lj_preprocessed):
        pre, config = lj_preprocessed
        save_dir = Path(config.preprocessing.save_dir)
        stats = json.loads((save_dir / "stats.json").read_text())
        assert "pitch" in stats and "energy" in stats
        assert stats["pitch"]["std"] > 0
        # After normalization the corpus-wide values are ~zero-mean/unit-var.
        all_pitch = np.concatenate(
            [np.load(p) for p in (save_dir / "pitch").glob("*.npy")]
        )
        assert abs(all_pitch.mean()) < 0.1
        assert abs(all_pitch.std() - 1.0) < 0.1

    def test_pitch_values_plausible_for_lj(self, lj_preprocessed):
        """LJ is a female speaker (~170-260 Hz median F0); check the raw
        stats captured before normalization."""
        pre, config = lj_preprocessed
        stats = json.loads(
            (Path(config.preprocessing.save_dir) / "stats.json").read_text()
        )
        assert 120 < stats["pitch"]["mean"] < 320

    def test_split_filelists_written(self, lj_preprocessed):
        pre, config = lj_preprocessed
        save_dir = Path(config.preprocessing.save_dir)
        train = generic_psv_filelist_reader(save_dir / "training_filelist.psv")
        val = generic_psv_filelist_reader(save_dir / "validation_filelist.psv")
        assert len(train) > 0 and len(val) > 0
        assert "character_tokens" in train[0]
        assert "phone_tokens" in train[0]

    def test_attn_prior_shapes(self, lj_preprocessed):
        pre, config = lj_preprocessed
        save_dir = Path(config.preprocessing.save_dir)
        priors = list((save_dir / "attn").glob("*characters-attn-prior.npy"))
        assert priors
        for p in priors[:2]:
            prior = np.load(p)
            assert prior.ndim == 2
            # rows = mel frames (hundreds), cols = text tokens (dozens)
            assert prior.shape[0] > prior.shape[1]
            assert (prior >= 0).all()
            # The prior is diagonal-ish: the most likely text position is
            # non-decreasing over mel frames.
            assert (np.diff(prior.argmax(axis=1)) >= 0).all()

    def test_config_lock_completed(self, lj_preprocessed):
        pre, config = lj_preprocessed
        lock = json.loads(
            (Path(config.preprocessing.save_dir) / ".config-lock").read_text()
        )
        assert lock["status"] == "completed"

    def test_conflicting_lock_detected(self, lj_preprocessed, tmp_path):
        pre, config = lj_preprocessed
        config2 = make_config(
            Path(config.preprocessing.save_dir).parent,
            LJ_DATA / "metadata.psv",
            LJ_WAVS,
        )
        config2.preprocessing.audio.n_mels = 96  # incompatible change
        pre2 = Preprocessor(config2)
        pre2.save_dir = Path(config.preprocessing.save_dir)
        assert pre2.config_lock_has_conflicts()


class TestRejections:
    def _run_audio(self, tmp_path, wav_name, wav_data, sr=22050):
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        write_wav(data_dir / f"{wav_name}.wav", wav_data, sr)
        filelist = tmp_path / "filelist.psv"
        filelist.write_text(
            f"basename|characters|language|speaker\n{wav_name}|hello|eng|default\n"
        )
        config = make_config(tmp_path, filelist, data_dir)
        pre = Preprocessor(config)
        result = pre.process_all_audio()
        return pre, result

    def test_too_short_rejected(self, tmp_path):
        pre, result = self._run_audio(
            tmp_path, "short", np.ones(2000, dtype=np.float32) * 0.5
        )
        assert result == []
        assert pre.counters.value("audio_too_short") == 1

    def test_too_long_rejected(self, tmp_path):
        pre, result = self._run_audio(
            tmp_path, "long",
            np.random.default_rng(0).standard_normal(22050 * 12).astype(np.float32) * 0.3,
        )
        assert result == []
        assert pre.counters.value("audio_too_long") == 1

    def test_quiet_rejected(self, tmp_path):
        t = np.arange(22050) / 22050
        quiet = (0.0005 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        pre, result = self._run_audio(tmp_path, "quiet", quiet)
        assert result == []
        assert pre.counters.value("audio_empty") == 1

    def test_missing_file_counted(self, tmp_path):
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        filelist = tmp_path / "filelist.psv"
        filelist.write_text("basename|characters\nnot_there|hello\n")
        config = make_config(tmp_path, filelist, data_dir)
        pre = Preprocessor(config)
        assert pre.process_all_audio() == []
        assert pre.counters.value("missing_files") == 1
        assert (
            "not_there" in pre.missing_files_list[0]
        )

    def test_good_audio_accepted_and_normalized(self, tmp_path):
        t = np.arange(22050) / 22050
        tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        pre, result = self._run_audio(tmp_path, "good", tone)
        assert len(result) == 1
        from everyvoice_tpu.dsp import read_wav

        saved, sr = read_wav(
            Path(pre.save_dir) / "audio" / "good--default--eng--audio-22050.wav"
        )
        assert sr == 22050
        assert saved.shape[1] % 256 == 0  # truncated to hop multiple
        assert abs(np.abs(saved).max() - 0.95) < 0.01  # peak normalized


class TestDeviceAudioPath:
    def test_device_path_matches_host_path(self, tmp_path):
        """The batched device audio conditioning (loudness + resample +
        peak-norm on the accelerator, round 5) must produce the same 16-bit
        artifacts as the per-file host path, including a dual-rate config's
        resampled output and the loudness reject gate."""
        from everyvoice_tpu.dsp import read_wav

        rng = np.random.default_rng(7)
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        rows = ["basename|characters"]
        t = np.arange(int(22050 * 1.7)) / 22050
        clips = {
            "tone": (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
            "noise": (0.2 * rng.standard_normal(len(t))).astype(np.float32),
            "quiet": (0.0005 * np.sin(2 * np.pi * 440 * t)).astype(
                np.float32
            ),
        }
        for name, clip in clips.items():
            write_wav(data_dir / f"{name}.wav", clip, 22050, 16)
            rows.append(f"{name}|hello world")
        filelist = tmp_path / "filelist.psv"
        filelist.write_text("\n".join(rows) + "\n")

        results = {}
        for label, device_audio in (("host", False), ("device", True)):
            config = make_config(tmp_path / label, filelist, data_dir)
            # Dual-rate: exercise the resample path on device too.
            config.preprocessing.audio.output_sampling_rate = 44100
            pre = Preprocessor(config)
            out = pre.process_all_audio(cpus=2, device_audio=device_audio)
            results[label] = (pre, out)

        host_pre, host_out = results["host"]
        dev_pre, dev_out = results["device"]
        # The quiet clip is rejected by the loudness gate on both paths.
        assert len(host_out) == len(dev_out) == 2
        assert host_pre.counters.value("audio_empty") == 1
        assert dev_pre.counters.value("audio_empty") == 1
        for name in ("tone", "noise"):
            for sr in (22050, 44100):
                fn = f"{name}--default--default--audio-{sr}.wav"
                a, sr_a = read_wav(Path(host_pre.save_dir) / "audio" / fn)
                b, sr_b = read_wav(Path(dev_pre.save_dir) / "audio" / fn)
                assert sr_a == sr_b == sr
                assert a.shape == b.shape, fn
                # 16-bit artifacts: identical up to 1 LSB (f32 conv
                # accumulation order differs between scipy and XLA).
                np.testing.assert_allclose(
                    a, b, atol=1.01 / 32768, err_msg=fn
                )


class TestSoxAndChannels:
    def _setup(self, tmp_path, wav_data, sr=22050, effects=None):
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        write_wav(data_dir / "clip.wav", wav_data, sr)
        filelist = tmp_path / "filelist.psv"
        filelist.write_text(
            "basename|characters|language|speaker\nclip|hello|eng|default\n"
        )
        config = make_config(tmp_path, filelist, data_dir)
        if effects is not None:
            config.preprocessing.source_data[0].sox_effects = effects
        return Preprocessor(config)

    def test_multichannel_rejected(self, tmp_path):
        """>2 channels is rejected and recorded, like the reference's
        multichannel report (preprocessor.py:131-218)."""
        t = np.arange(22050) / 22050
        tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        three = np.stack([tone, tone, tone])
        pre = self._setup(tmp_path, three)
        assert pre.process_all_audio() == []
        assert pre.counters.value("multichannel") == 1
        assert "clip.wav" in pre.multichannel_files_list[0]

    def test_stereo_mixdown_via_sox_channels_effect(self, tmp_path):
        """The default dataset effect [['channels','1']] mixes stereo down
        (reference preprocessing_config.py:118-121)."""
        t = np.arange(22050) / 22050
        left = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        right = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        pre = self._setup(
            tmp_path, np.stack([left, right]), effects=[["channels", "1"]]
        )
        result = pre.process_all_audio()
        assert len(result) == 1
        from everyvoice_tpu.dsp import read_wav

        saved, _ = read_wav(
            Path(pre.save_dir) / "audio" / "clip--default--eng--audio-22050.wav"
        )
        assert saved.shape[0] == 1  # mono after mixdown

    def test_bad_sox_effect_skips_file(self, tmp_path):
        t = np.arange(22050) / 22050
        tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        pre = self._setup(tmp_path, tone, effects=[["flanger", "oops"]])
        assert pre.process_all_audio() == []
        # Reference counter name (reference helpers.py:122 sox_error).
        assert pre.counters.value("sox_error") == 1


class TestIncrementalReuse:
    def test_second_run_skips_existing_artifacts(self, tmp_path):
        """Re-running preprocess without --overwrite reuses artifacts
        (reference's incremental behavior, preprocessor.py:974-1082)."""
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        t = np.arange(22050) / 22050
        tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        write_wav(data_dir / "clip.wav", tone, 22050)
        filelist = tmp_path / "filelist.psv"
        filelist.write_text(
            "basename|characters|language|speaker\nclip|hello|eng|default\n"
        )
        config = make_config(tmp_path, filelist, data_dir)
        Preprocessor(config).preprocess(
            to_process=("audio", "text", "spec", "attn", "energy", "pitch")
        )
        out = Path(config.preprocessing.save_dir)
        spec = next((out / "spec").glob("*.npy"))
        first_mtime = spec.stat().st_mtime_ns

        Preprocessor(config).preprocess(
            to_process=("audio", "text", "spec", "attn", "energy", "pitch")
        )
        assert spec.stat().st_mtime_ns == first_mtime  # untouched

        pre = Preprocessor(config)
        pre.preprocess(
            to_process=("audio", "text", "spec", "attn", "energy", "pitch"),
            overwrite=True,
        )
        assert spec.stat().st_mtime_ns != first_mtime  # rewritten

    def test_arpabet_dataset_gets_phone_tokens(self, tmp_path):
        """An arpabet-representation filelist must yield phone tokens: the
        audio stage keeps the 'arpabet' column so the text stage can
        convert it to IPA (reference: arpabet is always converted to IPA
        during preprocessing)."""
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        t = np.arange(22050) / 22050
        tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        write_wav(data_dir / "clip.wav", tone, 22050)
        filelist = tmp_path / "filelist.psv"
        filelist.write_text(
            "basename|arpabet|language|speaker\nclip|HH AH0 L OW1|eng|default\n"
        )
        config = make_config(tmp_path, filelist, data_dir)
        config.text.symbols.ipa = [
            "h", "ə", "l", "ˈ", "o", "ʊ", "͡", "w",
        ]
        Preprocessor(config).preprocess(to_process=("audio", "text"))
        out = Path(config.preprocessing.save_dir)
        rows = generic_psv_filelist_reader(out / "filelist.psv")
        assert rows[0].get("phone_tokens"), rows[0]

    def test_rerun_does_not_renormalize_stats(self, tmp_path):
        """A second preprocess run over already-normalized pitch/energy
        artifacts must leave stats.json AND the artifacts untouched —
        re-deriving stats from z-scored files yields degenerate
        mean≈0/std≈1 and double-normalizes the corpus."""
        import json

        data_dir = tmp_path / "data"
        data_dir.mkdir()
        t = np.arange(22050) / 22050
        tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        write_wav(data_dir / "clip.wav", tone, 22050)
        filelist = tmp_path / "filelist.psv"
        filelist.write_text(
            "basename|characters|language|speaker\nclip|hello|eng|default\n"
        )
        config = make_config(tmp_path, filelist, data_dir)
        steps = ("audio", "text", "spec", "energy", "pitch")
        Preprocessor(config).preprocess(to_process=steps)
        out = Path(config.preprocessing.save_dir)
        stats_path = out / "stats.json"
        stats_1 = json.loads(stats_path.read_text())
        pitch_path = next((out / "pitch").glob("*.npy"))
        pitch_1 = np.load(pitch_path)

        Preprocessor(config).preprocess(to_process=steps)
        stats_2 = json.loads(stats_path.read_text())
        assert stats_2 == stats_1
        np.testing.assert_array_equal(np.load(pitch_path), pitch_1)
        # A 220 Hz tone's true pitch stats must survive (not collapse to
        # the z-scored mean≈0).
        assert abs(stats_1["pitch"]["mean"]) > 50


class TestOODExport:
    def test_ood_filelists_written_per_language(self, tmp_path):
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        filelist = tmp_path / "filelist.psv"
        filelist.write_text("basename|characters\nclip|hello\n")
        config = make_config(tmp_path, filelist, data_dir)
        pre = Preprocessor(config)
        pre.preprocess_ood(
            {"eng": ["an out of domain line", "another one"],
             "fra": ["une ligne hors domaine"]}
        )
        ood = Path(config.preprocessing.save_dir) / "ood"
        assert (ood / "eng.psv").exists()
        assert (ood / "fra.psv").exists()
        assert "out of domain" in (ood / "eng.psv").read_text()

    def test_cli_ood_step_from_local_source(self, tmp_path, lj_corpus):
        """`preprocess text-to-wav -s ood` gathers configured local OOD
        text into {save_dir}/ood/<lang>.psv (reference
        preprocessor.py:1242-1321, reachable from the CLI)."""
        from click.testing import CliRunner

        from everyvoice_tpu.cli import main
        from everyvoice_tpu.models.styletts2.config import StyleTTS2Config
        from everyvoice_tpu.utils import write_config_file

        fs2_config, save_dir = lj_corpus
        ood_file = tmp_path / "ood.txt"
        ood_file.write_text(
            "This sentence is long enough to clear the default minimum "
            "length threshold for out of domain data.\n"
            "Another sufficiently long out of domain sentence for the "
            "discriminator to listen to carefully.\n"
        )
        config = StyleTTS2Config(
            contact={"contact_name": "Test Runner",
                     "contact_email": "info@everyvoice.ca"},
            preprocessing=fs2_config.preprocessing.model_dump(),
            text=fs2_config.text.model_dump(),
        )
        config.preprocessing.save_dir = save_dir
        from everyvoice_tpu.models.styletts2.config import OODDataSource

        config.training.ood_raw_data = {
            "eng": OODDataSource(local_path=ood_file)
        }
        config_path = tmp_path / "e2e.json"
        write_config_file(config_path, config.model_dump(mode="json"))
        result = CliRunner().invoke(
            main,
            ["preprocess", "text-to-wav", str(config_path), "-s", "ood"],
        )
        assert result.exit_code == 0, result.output
        assert "eng" in result.output
        staged = save_dir / "ood" / "eng.psv"
        assert staged.exists()
        assert "long enough" in staged.read_text()


class TestNativeBatchLoader:
    def test_native_batches_match_python_path(self, lj_corpus):
        """The C thread-pool batch assembly must produce byte-identical
        batches to the np.load path over real preprocessed artifacts."""
        from everyvoice_tpu.dataloader import FastSpeech2Dataset
        from everyvoice_tpu.native import npy as native_npy
        from everyvoice_tpu.text.lookups import lookuptables_from_data
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        if not native_npy.available():
            pytest.skip("no C compiler in this environment")
        config, save_dir = lj_corpus
        rows = generic_psv_filelist_reader(save_dir / "training_filelist.psv")
        lang2id, speaker2id = lookuptables_from_data((rows,))
        ds_native = FastSpeech2Dataset(rows, config, lang2id, speaker2id)
        # Small corpora prefer the cached python path; force the native
        # assembly path for the equivalence check.
        ds_native.max_cache_items = 0
        ds_python = FastSpeech2Dataset(
            rows, config, lang2id, speaker2id,
            text_processor=ds_native.text_processor,
        )
        assert ds_native._native_io()
        native_batches = list(ds_native.batches(2, shuffle=False))
        import os

        os.environ["EVERYVOICE_NO_NATIVE_IO"] = "1"
        try:
            assert not ds_python._native_io()
            python_batches = list(ds_python.batches(2, shuffle=False))
        finally:
            del os.environ["EVERYVOICE_NO_NATIVE_IO"]
        assert len(native_batches) == len(python_batches) > 0
        for nb, pb in zip(native_batches, python_batches):
            assert nb["basenames"] == pb["basenames"]
            for key in pb:
                if key == "basenames":
                    continue
                assert np.array_equal(nb[key], pb[key]), key

    def test_foreign_dtype_falls_back_once_per_epoch(self, lj_corpus):
        """A float64 artifact (e.g. externally produced) must drop the
        epoch to the np.load path after ONE failed native read — not
        hard-error, and not retry the native read for every batch."""
        from everyvoice_tpu.dataloader import FastSpeech2Dataset
        from everyvoice_tpu.native import npy as native_npy
        from everyvoice_tpu.text.lookups import lookuptables_from_data
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        if not native_npy.available():
            pytest.skip("no C compiler in this environment")
        config, save_dir = lj_corpus
        rows = generic_psv_filelist_reader(save_dir / "training_filelist.psv")
        lang2id, speaker2id = lookuptables_from_data((rows,))
        ds = FastSpeech2Dataset(rows, config, lang2id, speaker2id)
        ds.max_cache_items = 0
        assert ds._native_io()
        pitch_path = ds._path(ds.items[0], "pitch", "pitch.npy")
        original = np.load(pitch_path)
        calls = {"n": 0}
        real_read_many = native_npy.read_npy_many

        def counting_read_many(tasks, n_threads=None):
            calls["n"] += 1
            return real_read_many(tasks, n_threads)

        try:
            np.save(pitch_path, original.astype(np.float64))
            native_npy.read_npy_many = counting_read_many
            batches = list(ds.batches(1, shuffle=False))
        finally:
            native_npy.read_npy_many = real_read_many
            np.save(pitch_path, original)
        assert len(batches) == len(ds.items)
        assert ds._native_failed
        # Exactly one native attempt (the failing first batch); every later
        # batch goes straight to np.load instead of re-reading everything
        # natively first.
        assert calls["n"] == 1
        np.testing.assert_allclose(
            batches[0]["pitch"][0, : original.shape[-1]],
            original.astype(np.float32).reshape(-1),
            rtol=1e-6, atol=1e-6,
        )


class TestReports:
    """Report files parity (reference preprocessor.py:320-368,1120-1152 and
    test_multichannel_files_file_creation / test_missing_files_detection)."""

    def _run_audio(self, tmp_path, rows, wavs):
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        for name, wav in wavs.items():
            write_wav(data_dir / f"{name}.wav", wav, 22050)
        filelist = tmp_path / "filelist.psv"
        filelist.write_text(
            "basename|characters|language|speaker\n"
            + "".join(f"{r}|hello|eng|default\n" for r in rows)
        )
        pre = Preprocessor(make_config(tmp_path, filelist, data_dir))
        try:
            pre.preprocess(to_process=("audio",), overwrite=True)
        except RuntimeError:
            pass  # empty filtered filelist still writes its reports
        return pre

    def _tone(self, channels=1):
        t = np.arange(22050) / 22050
        tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        return np.stack([tone] * channels) if channels > 1 else tone

    def test_multichannel_report_written(self, tmp_path):
        pre = self._run_audio(
            tmp_path, ["good", "multi"],
            {"good": self._tone(), "multi": self._tone(channels=3)},
        )
        report = Path(pre.save_dir) / "multichannel_files.txt"
        assert report.exists()
        content = report.read_text()
        assert "multi.wav" in content and "1 total" in content
        assert "good.wav" not in content

    def test_missing_files_report_written(self, tmp_path):
        pre = self._run_audio(
            tmp_path, ["good", "ghost"], {"good": self._tone()}
        )
        report = Path(pre.save_dir) / "missing_files.txt"
        assert report.exists()
        assert "ghost.wav" in report.read_text()

    def test_reports_written_even_when_everything_filtered(self, tmp_path):
        pre = self._run_audio(
            tmp_path, ["multi"], {"multi": self._tone(channels=3)}
        )
        assert (Path(pre.save_dir) / "summary.txt").exists()
        assert (Path(pre.save_dir) / "multichannel_files.txt").exists()

    def test_summary_counts(self, tmp_path):
        pre = self._run_audio(
            tmp_path, ["good", "ghost", "multi"],
            {"good": self._tone(), "multi": self._tone(channels=3)},
        )
        summary = json.loads((Path(pre.save_dir) / "summary.txt").read_text())
        assert summary["missing_files"] == 1
        assert summary["multichannel"] == 1

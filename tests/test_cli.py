"""CLI surface tests (model: reference everyvoice/tests/test_cli.py)."""

import json
from pathlib import Path

import pytest
from click.testing import CliRunner

from everyvoice_tpu.cli import main

EXPECTED_COMMANDS = [
    "check", "checkpoint", "demo", "evaluate", "export", "fetch-pretrained",
    "g2p", "new-project", "preprocess", "segment", "synthesize", "train",
    "update-schemas",
]


@pytest.fixture(scope="module")
def runner():
    return CliRunner()


# dummy_ckpts comes from conftest (session-scoped stub checkpoints).


class TestDemoFlags:
    """Reference demo flag semantics (cli.py:934-1075): allowlist/denylist
    are mutually exclusive; --share has no tunnel here and must error, not
    silently no-op."""

    def test_allow_and_deny_mutually_exclusive(self, runner, tmp_path,
                                               dummy_ckpts):
        lst = tmp_path / "words.txt"
        lst.write_text("hello\n")
        result = runner.invoke(main, [
            "demo", str(dummy_ckpts["fs2"]),
            "--allowlist", str(lst), "--denylist", str(lst),
        ])
        assert result.exit_code != 0
        assert "not both" in result.output

    def test_share_is_a_loud_error(self, runner, dummy_ckpts):
        result = runner.invoke(
            main, ["demo", str(dummy_ckpts["fs2"]), "--share"]
        )
        assert result.exit_code != 0
        assert "--share is not supported" in result.output

    def test_reference_flag_spellings_in_help(self, runner):
        result = runner.invoke(main, ["demo", "--help"])
        assert result.exit_code == 0
        for flag in ("-V", "--vocoder", "-s", "--speaker", "-l", "--language",
                     "-O", "--output-format", "-o", "--output-dir",
                     "-R", "--ref-speaker", "-r", "--reference",
                     "-p", "--port", "-n", "--server-name",
                     "-a", "--accelerator"):
            assert flag in result.output, flag


class TestSynthesizeTextToWav:
    """`synthesize text-to-wav` (reference regression-test.sh:110) is the
    StyleTTS2 end-to-end path with style-control flags."""

    def test_rejects_non_styletts2_checkpoint(self, runner, dummy_ckpts):
        result = runner.invoke(main, [
            "synthesize", "text-to-wav", str(dummy_ckpts["fs2"]),
            "--text", "hello",
        ])
        assert result.exit_code != 0
        assert "StyleTTS2 checkpoint" in result.output

    def test_style_flags_in_help(self, runner):
        result = runner.invoke(main, ["synthesize", "text-to-wav", "--help"])
        assert result.exit_code == 0
        for flag in ("--reference", "--diffusion-steps", "--embedding-scale",
                     "--acoustic-blend", "--prosody-blend", "--seed"):
            assert flag in result.output, flag

    @pytest.mark.slow
    def test_end_to_end_with_reference_style(self, runner, tmp_path):
        import sys

        sys.path.insert(0, str(Path(__file__).parent))
        from model_stubs import get_dummy_styletts2_checkpoint

        ckpt = get_dummy_styletts2_checkpoint(tmp_path)
        ref = (Path("/root/reference/everyvoice/tests/data/lj/wavs")
               / "LJ050-0269.wav")
        result = runner.invoke(main, [
            "synthesize", "text-to-wav", str(ckpt),
            "--text", "hello world", "--reference", str(ref),
            "--diffusion-steps", "2", "-o", str(tmp_path / "out"),
        ])
        assert result.exit_code == 0, result.output
        wavs = list((tmp_path / "out" / "wav").glob("*.wav"))
        assert len(wavs) == 1


class TestHelp:
    def test_all_commands_listed(self, runner):
        result = runner.invoke(main, ["--help"])
        assert result.exit_code == 0
        for command in EXPECTED_COMMANDS:
            assert command in result.output, command

    def test_subcommand_help(self, runner):
        for args in (["train", "--help"], ["synthesize", "--help"],
                     ["checkpoint", "--help"], ["check", "--help"]):
            result = runner.invoke(main, args)
            assert result.exit_code == 0, args

    def test_train_groups(self, runner):
        result = runner.invoke(main, ["train", "--help"])
        for kind in ("text-to-spec", "spec-to-wav", "text-to-wav"):
            assert kind in result.output


class TestCheckpointCommands:
    def test_inspect(self, runner, dummy_ckpts):
        result = runner.invoke(
            main, ["checkpoint", "inspect", str(dummy_ckpts["fs2"])]
        )
        assert result.exit_code == 0
        assert "FastSpeech2" in result.output
        assert "default" in result.output  # speakers listed

    def test_inspect_architecture(self, runner, dummy_ckpts):
        result = runner.invoke(
            main,
            ["checkpoint", "inspect", str(dummy_ckpts["fs2"]),
             "--show-architecture", "--no-show-config"],
        )
        assert result.exit_code == 0
        assert "Total parameters" in result.output

    def test_rename_speaker(self, runner, dummy_ckpts, tmp_path):
        out = tmp_path / "renamed.ckpt"
        result = runner.invoke(
            main,
            ["checkpoint", "rename-speaker", str(dummy_ckpts["fs2"]),
             "default", "alice", str(out)],
        )
        assert result.exit_code == 0, result.output
        check = runner.invoke(main, ["checkpoint", "inspect", str(out)])
        assert "alice" in check.output


class TestExport:
    def test_export_generator(self, runner, dummy_ckpts, tmp_path):
        out = tmp_path / "gen.ckpt"
        result = runner.invoke(
            main, ["export", "spec-to-wav", str(dummy_ckpts["hifigan"]), str(out)]
        )
        assert result.exit_code == 0, result.output
        from everyvoice_tpu.train import load_checkpoint_header

        header = load_checkpoint_header(out)
        assert header["model_info"]["name"] == "HiFiGANGenerator"


class TestG2P:
    def test_eng(self, runner):
        result = runner.invoke(main, ["g2p", "eng", "hello"])
        assert result.exit_code == 0
        assert "ʌ" in result.output

    def test_unknown_language(self, runner):
        result = runner.invoke(main, ["g2p", "zzz", "hello"])
        assert result.exit_code != 0


class TestUpdateSchemas:
    def test_schemas_written(self, runner, tmp_path):
        result = runner.invoke(main, ["update-schemas", "-o", str(tmp_path)])
        assert result.exit_code == 0, result.output
        files = sorted(p.name for p in tmp_path.glob("*.json"))
        assert "everyvoice-text-to-spec-0.5.json" in files
        schema = json.loads(
            (tmp_path / "everyvoice-text-to-spec-0.5.json").read_text()
        )
        # Field parity with the reference's published schema
        ref = json.loads(
            Path(
                "/root/reference/everyvoice/.schema/everyvoice-text-to-spec-0.5.json"
            ).read_text()
        )
        ref_fields = set(ref["properties"])
        mine = set(schema["properties"])
        assert ref_fields <= mine, ref_fields - mine


class TestSynthesizeCLI:
    def test_from_text_requires_input(self, runner, dummy_ckpts):
        result = runner.invoke(
            main, ["synthesize", "from-text", str(dummy_ckpts["fs2"])]
        )
        assert result.exit_code != 0
        assert "--text" in result.output or "filelist" in result.output

    def test_wav_without_vocoder_rejected(self, runner, dummy_ckpts):
        result = runner.invoke(
            main,
            ["synthesize", "from-text", str(dummy_ckpts["fs2"]),
             "-t", "hello"],
        )
        assert result.exit_code != 0
        assert "vocoder" in result.output

    def test_spec_output(self, runner, dummy_ckpts, tmp_path):
        result = runner.invoke(
            main,
            ["synthesize", "from-text", str(dummy_ckpts["fs2"]),
             "-t", "hello world", "-O", "spec", "-o", str(tmp_path)],
        )
        assert result.exit_code == 0, result.output
        specs = list((tmp_path / "synthesized_spec").glob("*.npy"))
        assert len(specs) == 1

    def test_all_output_formats(self, runner, dummy_ckpts, tmp_path):
        """Every SynthesizeOutputFormat writes its artifact (reference
        regression-test.sh:75 exercises the same five)."""
        result = runner.invoke(
            main,
            ["synthesize", "from-text", str(dummy_ckpts["fs2"]),
             "-t", "hello world",
             "-O", "wav", "-O", "spec", "-O", "textgrid",
             "-O", "readalong-xml", "-O", "readalong-html",
             "--vocoder-path", str(dummy_ckpts["generator"]),
             "-o", str(tmp_path)],
        )
        assert result.exit_code == 0, result.output
        assert list((tmp_path / "wav").glob("*.wav"))
        assert list((tmp_path / "synthesized_spec").glob("*.npy"))
        grids = list((tmp_path / "textgrids").glob("*.TextGrid"))
        assert grids and "IntervalTier" in grids[0].read_text()
        ras = list((tmp_path / "readalongs").glob("*.readalong"))
        assert ras and "<read-along" in ras[0].read_text()
        html = list((tmp_path / "readalongs").glob("*.html"))
        assert html and "read-along" in html[0].read_text()

    def test_full_text_to_wav(self, runner, dummy_ckpts, tmp_path):
        result = runner.invoke(
            main,
            ["synthesize", "from-text", str(dummy_ckpts["fs2"]),
             "-t", "hello world", "-O", "wav",
             "--vocoder-path", str(dummy_ckpts["generator"]),
             "-o", str(tmp_path)],
        )
        assert result.exit_code == 0, result.output
        wavs = list((tmp_path / "wav").glob("*.wav"))
        assert len(wavs) == 1
        from everyvoice_tpu.dsp import read_wav

        audio, sr = read_wav(wavs[0])
        assert sr == 22050
        assert audio.shape[1] > 0


class TestStyleTTS2SynthesizeCLI:
    @pytest.mark.slow
    def test_direct_text_to_wav(self, runner, tmp_path):
        from model_stubs import get_dummy_styletts2_checkpoint

        ckpt = get_dummy_styletts2_checkpoint(tmp_path)
        out = tmp_path / "out"
        result = runner.invoke(
            main,
            ["synthesize", "from-text", str(ckpt), "-t", "hello", "-O", "wav",
             "-o", str(out)],
        )
        assert result.exit_code == 0, result.output
        wavs = list((out / "wav").glob("*.wav"))
        assert len(wavs) == 1


class TestBatchedSynthesis:
    def test_batched_matches_sequential_and_keeps_alignment(
        self, dummy_ckpts, tmp_path
    ):
        """Chunks from all texts are dispatched in padded batches; results
        must stay index-aligned with the inputs (a text with no valid
        symbols yields mel=None) and match one-text-at-a-time output."""
        import numpy as np

        from everyvoice_tpu.models.fs2.synthesize import Synthesizer

        synth = Synthesizer(
            dummy_ckpts["fs2"], vocoder_checkpoint=dummy_ckpts["generator"]
        )
        texts = ["hello world", "ሴስ", "the quick brown fox"]
        batched = synth.synthesize(texts, batch_size=4)
        assert len(batched) == 3
        assert batched[1]["mel"] is None and batched[1]["wav"] is None
        for i in (0, 2):
            solo = synth.synthesize([texts[i]], batch_size=1)[0]
            assert batched[i]["mel"].shape == solo["mel"].shape
            np.testing.assert_allclose(
                batched[i]["mel"], solo["mel"], rtol=1e-4, atol=1e-4
            )
            assert batched[i]["wav"] is not None
        # write_outputs skips the empty entry but keeps basename pairing
        written = synth.write_outputs(
            batched, tmp_path, ("wav",), basenames=["a", "b", "c"]
        )
        names = sorted(p.name for p in written)
        assert names == ["a--default--default.wav", "c--default--default.wav"]


class TestLongFormSynthesis:
    def test_chunked_text_concatenates(self, runner, dummy_ckpts, tmp_path):
        """Long text is chunked at strong boundaries, synthesized per chunk,
        and re-concatenated (reference split_text behavior)."""
        long_text = "This is a sentence. " * 20  # > max chunk length
        result = runner.invoke(
            main,
            ["synthesize", "from-text", str(dummy_ckpts["fs2"]),
             "-t", long_text, "-O", "spec", "-o", str(tmp_path)],
        )
        assert result.exit_code == 0, result.output
        import numpy as np

        specs = list((tmp_path / "synthesized_spec").glob("*.npy"))
        assert len(specs) == 1  # chunks merged into one output
        mel = np.load(specs[0])
        assert mel.shape[0] == 80


class TestEvaluateCLI:
    def test_evaluate_with_reference(self, runner, tmp_path):
        import numpy as np

        from everyvoice_tpu.dsp import write_wav

        t = np.arange(22050) / 22050
        x = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        est = tmp_path / "est"; ref = tmp_path / "ref"
        est.mkdir(); ref.mkdir()
        write_wav(est / "a.wav", x * 0.8, 22050)
        write_wav(ref / "a.wav", x, 22050)
        out = tmp_path / "eval.json"
        result = runner.invoke(
            main, ["evaluate", str(est), "-g", str(ref), "-o", str(out)]
        )
        assert result.exit_code == 0, result.output
        data = json.loads(out.read_text())
        assert data[0]["si_sdr"] > 30

        # Reference flag spellings (-f single file / -d directory,
        # everyvoice/cli.py:248-262) address the same paths.
        out2 = tmp_path / "eval2.json"
        result = runner.invoke(
            main, ["evaluate", "-f", str(est / "a.wav"), "-o", str(out2)]
        )
        assert result.exit_code == 0, result.output
        assert len(json.loads(out2.read_text())) == 1
        result = runner.invoke(
            main, ["evaluate", "-d", str(est), "-o", str(out2)]
        )
        assert result.exit_code == 0, result.output

        # Exactly one target is required (reference cli.py:293-300).
        result = runner.invoke(main, ["evaluate"])
        assert result.exit_code != 0
        result = runner.invoke(
            main, ["evaluate", str(est), "-f", str(est / "a.wav")]
        )
        assert result.exit_code != 0


class TestFetchPretrained:
    def test_downloads_and_prints_overrides(self, tmp_path, monkeypatch):
        """fetch-pretrained drives huggingface_hub for the StyleTTS2
        components (reference cli.py:622-644); the hub is faked here since
        CI has no egress."""
        import sys
        import types

        calls = []
        fake = types.ModuleType("huggingface_hub")

        def hf_hub_download(repo_id, filename, cache_dir=None):
            calls.append((repo_id, filename))
            out = Path(cache_dir) / repo_id.replace("/", "--") / filename
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_bytes(b"weights")
            return str(out)

        def snapshot_download(repo_id, cache_dir=None):
            calls.append((repo_id, "<snapshot>"))
            out = Path(cache_dir) / repo_id.replace("/", "--")
            out.mkdir(parents=True, exist_ok=True)
            return str(out)

        fake.hf_hub_download = hf_hub_download
        fake.snapshot_download = snapshot_download
        monkeypatch.setitem(sys.modules, "huggingface_hub", fake)

        from click.testing import CliRunner

        from everyvoice_tpu.cli import main

        result = CliRunner().invoke(
            main,
            ["fetch-pretrained", "text-to-wav", "--output-dir", str(tmp_path)],
        )
        assert result.exit_code == 0, result.output
        repos = {repo for repo, _ in calls}
        assert "everyvoice/styletts2-jdc-f0" in repos
        assert "everyvoice/styletts2-asr-aligner" in repos
        assert "papercup-ai/multilingual-pl-bert" in repos
        assert "microsoft/wavlm-base-plus" in repos
        assert "-c pretrained.f0.local_path=" in result.output
        assert "-c model.slm.model=" in result.output

    def test_clean_error_without_network(self, tmp_path, monkeypatch):
        import sys
        import types

        fake = types.ModuleType("huggingface_hub")

        def boom(*args, **kwargs):
            raise OSError("no route to host")

        fake.hf_hub_download = boom
        fake.snapshot_download = boom
        monkeypatch.setitem(sys.modules, "huggingface_hub", fake)

        from click.testing import CliRunner

        from everyvoice_tpu.cli import main

        result = CliRunner().invoke(
            main,
            ["fetch-pretrained", "text-to-wav", "--output-dir", str(tmp_path)],
        )
        assert result.exit_code != 0
        assert "stage the files manually" in result.output


class TestDiagnostic:
    def test_diagnostic_flag(self):
        from click.testing import CliRunner

        from everyvoice_tpu.cli import main

        result = CliRunner().invoke(main, ["--diagnostic"])
        assert result.exit_code == 0
        assert "EveryVoice-TPU version" in result.output
        assert "Python version" in result.output
        assert "jax==" in result.output


class TestCheckGroup:
    """`check` verbs (reference base_cli/check_group.py + test_cli.py:521-736)."""

    def test_text_config_all_covered(self, runner, tmp_path):
        from everyvoice_tpu.utils import write_config_file

        config_path = tmp_path / "text.yaml"
        write_config_file(
            config_path, {"symbols": {"letters": list("helo wrd")}}
        )
        filelist = tmp_path / "fl.psv"
        filelist.write_text("basename|characters\nitem|hello world\n")
        result = runner.invoke(
            main, ["check", "text-config", str(config_path), "-f", str(filelist)]
        )
        assert result.exit_code == 0, result.output
        assert "No missing symbols" in result.output

    def test_text_config_reports_missing(self, runner, tmp_path):
        from everyvoice_tpu.utils import write_config_file

        config_path = tmp_path / "text.yaml"
        write_config_file(config_path, {"symbols": {"letters": list("helo")}})
        filelist = tmp_path / "fl.psv"
        filelist.write_text("basename|characters\nitem|hello xyz\nit2|zap\n")
        result = runner.invoke(
            main, ["check", "text-config", str(config_path), "-f", str(filelist)]
        )
        assert result.exit_code == 1
        assert "Missing symbols" in result.output
        assert "'z'" in result.output and "'x'" in result.output

    def _styletts2_config(self, tmp_path, pretrained_symbols, user_symbols):
        from everyvoice_tpu.models.styletts2.config import StyleTTS2Config
        from everyvoice_tpu.utils import write_config_file

        config = StyleTTS2Config(
            contact={"contact_name": "Test Runner",
                     "contact_email": "info@everyvoice.ca"},
            pretrained={"pretrained_symbols": pretrained_symbols},
            text={"symbols": {"letters": user_symbols}},
        )
        path = tmp_path / "everyvoice-text-to-wav.yaml"
        write_config_file(path, config.model_dump(mode="json"))
        return path

    def test_pretrained_symbols_all_present(self, runner, tmp_path):
        path = self._styletts2_config(
            tmp_path, list("abcdefghijklmnopqrstuvwxyz "), list("abc")
        )
        result = runner.invoke(main, ["check", "pretrained-symbols", str(path)])
        assert result.exit_code == 0, result.output
        assert "All your symbols exist" in result.output

    def test_pretrained_symbols_suggestions(self, runner, tmp_path):
        path = self._styletts2_config(tmp_path, list("abc "), ["a", "q"])
        result = runner.invoke(main, ["check", "pretrained-symbols", str(path)])
        assert result.exit_code == 1
        assert "Suggested substitutions" in result.output
        assert "'q'" in result.output

    def test_pretrained_symbols_requires_table(self, runner, tmp_path):
        path = self._styletts2_config(tmp_path, [], list("abc"))
        result = runner.invoke(main, ["check", "pretrained-symbols", str(path)])
        assert result.exit_code != 0
        assert "No pretrained_symbols" in result.output


@pytest.mark.slow
class TestCheckData:
    def test_per_item_loss_report(self, runner, lj_corpus, tmp_path):
        import jax
        import jax.numpy as jnp

        from everyvoice_tpu.models.fs2 import FastSpeech2
        from everyvoice_tpu.text import TextProcessor
        from everyvoice_tpu.train import save_checkpoint
        from everyvoice_tpu.utils import write_config_file

        config, save_dir = lj_corpus
        config_path = tmp_path / "everyvoice-text-to-spec.yaml"
        write_config_file(config_path, config.model_dump(mode="json"))

        tp = TextProcessor(config.text)
        model = FastSpeech2.from_config(config, n_symbols=len(tp.symbols))
        rng = jax.random.PRNGKey(0)
        # Init with training inputs so the alignment branch's parameters
        # exist in the checkpoint (check data scores with mel targets).
        n_frames = 16
        params = model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((1, 8), jnp.int32), jnp.asarray([8], jnp.int32),
            mel=jnp.zeros((1, n_frames, 80)),
            mel_lengths=jnp.asarray([n_frames], jnp.int32),
            attn_prior=jnp.full((1, n_frames, 8), 1.0 / 8),
            pitch=jnp.zeros((1, n_frames)),
            energy=jnp.zeros((1, n_frames)),
        )
        ckpt = tmp_path / "fs2.ckpt"
        save_checkpoint(
            ckpt, "FastSpeech2", config, params,
            lang2id={"eng": 0}, speaker2id={"default": 0},
            stats={"pitch": {"mean": 0.0, "std": 1.0},
                   "energy": {"mean": 0.0, "std": 1.0}},
        )
        out = tmp_path / "checked.json"
        result = runner.invoke(
            main,
            ["check", "data", str(config_path), "--model-path", str(ckpt),
             "-o", str(out)],
        )
        assert result.exit_code == 0, result.output
        rows = json.loads(out.read_text())
        assert rows and all("total" in r and "basename" in r for r in rows)
        totals = [r["total"] for r in rows]
        assert totals == sorted(totals, reverse=True)  # worst first


class TestVersionAndErrors:
    def test_version_flag(self, runner):
        from everyvoice_tpu import __version__

        result = runner.invoke(main, ["--version"])
        assert result.exit_code == 0
        assert __version__ in result.output

    def test_inspect_not_a_checkpoint(self, runner, tmp_path):
        bogus = tmp_path / "not_a_ckpt.ckpt"
        bogus.write_bytes(b"definitely not msgpack")
        result = runner.invoke(
            main, ["checkpoint", "inspect", str(bogus)]
        )
        assert result.exit_code != 0
        assert result.exception is None or isinstance(
            result.exception, SystemExit
        )  # clean CLI error, not a traceback
        assert "checkpoint" in result.output.lower()

    def test_rename_missing_speaker_errors(self, runner, dummy_ckpts, tmp_path):
        out = tmp_path / "renamed.ckpt"
        result = runner.invoke(
            main,
            ["checkpoint", "rename-speaker", str(dummy_ckpts["fs2"]),
             "nobody", "alice", str(out)],
        )
        assert result.exit_code != 0
        assert "nobody" in result.output
        assert not out.exists()


class TestCommandOrdering:
    def test_pipeline_verbs_listed_first(self, runner):
        """Help lists the workflow verbs in pipeline order before the rest
        (reference cli.py:89 MainCommandOrder)."""
        result = runner.invoke(main, ["--help"])
        lines = result.output.splitlines()
        listed = [
            line.strip().split()[0]
            for line in lines[lines.index("Commands:") + 1:]
            if line.strip()
        ]
        assert listed[:5] == [
            "new-project", "preprocess", "train", "synthesize", "demo",
        ]
        assert listed[5:] == sorted(listed[5:])

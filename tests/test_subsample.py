"""Corpus subsampler tests (reference everyvoice/tests/test_subsample.py)."""

from pathlib import Path

from click.testing import CliRunner

import sys

sys.path.insert(0, str(Path(__file__).parent / "regression"))
from subsample import subsample, wav_duration_seconds  # noqa: E402

DATA = Path("/root/reference/everyvoice/tests/data")
WAVS = DATA / "lj" / "wavs"


def run(*args):
    return CliRunner().invoke(subsample, [str(a) for a in args])


class TestSubsample:
    def test_psv_with_header(self):
        result = run(DATA / "metadata.psv", WAVS, "--header", "-d", 12,
                     "-f", "psv")
        assert result.exit_code == 0, result.output
        lines = result.output.splitlines()
        # Header + the first two records (5.17 s + 7.01 s >= 12 s).
        assert lines[0].startswith("basename|")
        assert len(lines) == 3
        assert lines[1].startswith("LJ050-0269|")
        assert lines[2].startswith("LJ050-0270|")

    def test_duration_larger_than_corpus_keeps_everything(self):
        result = run(DATA / "metadata.psv", WAVS, "--header", "-d", 9999,
                     "-f", "psv")
        assert result.exit_code == 0, result.output
        assert len(result.output.splitlines()) == 6  # header + all 5

    def test_speaker_filter(self):
        result = run(DATA / "metadata.psv", WAVS, "--header", "-d", 5,
                     "-f", "psv", "-s", 4, "-i", "default")
        assert result.exit_code == 0, result.output
        assert len(result.output.splitlines()) == 2  # header + 1 record

    def test_speaker_filter_no_match_outputs_header_only(self):
        result = run(DATA / "metadata.psv", WAVS, "--header", "-d", 5,
                     "-f", "psv", "-s", 4, "-i", "nobody")
        assert result.exit_code == 0, result.output
        assert len(result.output.splitlines()) == 1

    def test_festival_format(self, tmp_path):
        meta = tmp_path / "meta.festival"
        meta.write_text(
            '( LJ050-0269 "The essential terms." )\n'
            '( LJ050-0270 "No procedures." )\n'
            '( LJ050-0271 "So varied and complex." )\n'
        )
        result = run(meta, WAVS, "-d", 12, "-f", "festival")
        assert result.exit_code == 0, result.output
        assert len(result.output.splitlines()) == 2

    def test_festival_with_speakerid_rejected(self, tmp_path):
        meta = tmp_path / "meta.festival"
        meta.write_text('( LJ050-0269 "text" )\n')
        result = run(meta, WAVS, "-d", 5, "-f", "festival", "-i", "spk")
        assert result.exit_code != 0
        assert "cannot have a speaker id" in result.output

    def test_missing_wav_errors_with_guidance(self, tmp_path):
        meta = tmp_path / "meta.psv"
        meta.write_text("nonexistent|some text\n")
        result = run(meta, WAVS, "-d", 5, "-f", "psv")
        assert result.exit_code != 0
        assert "--header" in result.output

    def test_basename_column_option(self, tmp_path):
        meta = tmp_path / "meta.csv"
        meta.write_text("some text,LJ050-0269\nmore text,LJ050-0270\n")
        result = run(meta, WAVS, "-d", 5, "-f", "csv", "-b", 1)
        assert result.exit_code == 0, result.output
        assert result.output.splitlines() == ["some text,LJ050-0269"]

    def test_wav_duration_header_only(self):
        assert abs(wav_duration_seconds(WAVS / "LJ050-0269.wav") - 5.17) < 0.01


class TestCRLF:
    def test_windows_line_endings(self, tmp_path):
        meta = tmp_path / "meta.psv"
        meta.write_bytes(b"LJ050-0269|text|spkA\r\nLJ050-0270|text|spkB\r\n")
        result = run(meta, WAVS, "-d", 5, "-f", "psv", "-s", 2, "-i", "spkA")
        assert result.exit_code == 0, result.output
        assert "LJ050-0269" in result.output
        assert "LJ050-0270" not in result.output

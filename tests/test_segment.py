"""CTC alignment + segmentation tests
(role parity: the wav2vec2aligner submodule's `segment align|extract`,
reference cli.py:25-37,392-415 — exercised here with a stub acoustic model
since no wav2vec2 weights ship with this environment)."""

from pathlib import Path

import numpy as np

from everyvoice_tpu.models.aligner.segment import (
    align_long_audio,
    ctc_forced_alignment,
    extract_segments,
    parse_textgrid,
    segments_to_textgrid,
)

NEG = -20.0


def make_log_probs(frame_labels, vocab_size):
    """Frame-wise near-one-hot log-probabilities."""
    t = len(frame_labels)
    lp = np.full((t, vocab_size), NEG, np.float64)
    for i, label in enumerate(frame_labels):
        lp[i, label] = 0.0
    return lp


class TestCTCForcedAlignment:
    def test_recovers_clear_spans(self):
        # blank=0; labels 1,2,3 each active for 3 frames with blanks between
        frames = [0, 1, 1, 1, 0, 2, 2, 2, 0, 3, 3, 3, 0]
        lp = make_log_probs(frames, 4)
        spans = ctc_forced_alignment(lp, [1, 2, 3])
        assert [s[0] for s in spans] == [0, 1, 2]
        assert spans[0][1:] == (1, 4)
        assert spans[1][1:] == (5, 8)
        assert spans[2][1:] == (9, 12)

    def test_repeated_labels_need_blank(self):
        frames = [1, 1, 0, 1, 1]
        lp = make_log_probs(frames, 2)
        spans = ctc_forced_alignment(lp, [1, 1])
        # Two separate spans split by the blank.
        assert spans[0][2] <= spans[1][1]

    def test_all_labels_get_spans_when_frames_suffice(self):
        # Forced alignment must place every target label even when the
        # acoustics only support the first one.
        frames = [1, 1, 1]
        lp = make_log_probs(frames, 3)
        spans = ctc_forced_alignment(lp, [1, 2])
        assert spans[0][1] == 0
        assert spans[1][2] == 3  # label 2 forced onto the tail frames
        assert spans[0][2] <= spans[1][1]

    def test_squeezed_label_gets_empty_span(self):
        # Fewer frames than labels: the overflow label reports zero length.
        lp = make_log_probs([1], 3)
        spans = ctc_forced_alignment(lp, [1, 2])
        assert spans[1][1] == spans[1][2]


class TestAlignAndExtract:
    def _stub_vocab(self):
        # blank + letters + word separator
        letters = "abcdefghijklmnopqrstuvwxyz".upper()
        vocab = {"<pad>": 0}
        for i, ch in enumerate(letters, start=1):
            vocab[ch] = i
        vocab["|"] = len(vocab)
        return vocab

    def test_align_then_extract_roundtrip(self, tmp_path):
        from everyvoice_tpu.dsp import write_wav

        sr = 16000
        duration = 2.0
        audio = (
            0.3 * np.sin(2 * np.pi * 220 * np.arange(int(sr * duration)) / sr)
        ).astype(np.float32)
        wav_path = tmp_path / "long.wav"
        write_wav(wav_path, audio, sr)
        transcript = tmp_path / "transcript.txt"
        transcript.write_text("hi\nyo\n", encoding="utf8")

        vocab = self._stub_vocab()
        # 100 frames over 2 s; "HI" occupies ~[0.1, 0.9]s, "YO" ~[1.1, 1.9]s
        frames = [0] * 100
        for i in range(5, 25):
            frames[i] = vocab["H"]
        for i in range(25, 45):
            frames[i] = vocab["I"]
        for i in range(45, 50):
            frames[i] = vocab["|"]
        for i in range(55, 75):
            frames[i] = vocab["Y"]
        for i in range(75, 95):
            frames[i] = vocab["O"]
        lp = make_log_probs(frames, len(vocab))

        tg_path = tmp_path / "alignment.TextGrid"
        segments = align_long_audio(
            wav_path, transcript, tg_path,
            log_prob_fn=lambda a: lp, vocab=vocab,
        )
        assert [s[0] for s in segments] == ["hi", "yo"]
        assert abs(segments[0][1] - 0.1) < 0.05
        assert abs(segments[1][2] - 1.9) < 0.06

        # TextGrid round-trips through the parser
        parsed = parse_textgrid(tg_path)
        assert [p[0] for p in parsed] == ["hi", "yo"]

        rows = extract_segments(wav_path, parsed, tmp_path / "out")
        assert len(rows) == 2
        assert (tmp_path / "out" / "wavs" / "segment-00000.wav").exists()
        assert "hi" in (tmp_path / "out" / "metadata.psv").read_text()

    def test_cli_segment_extract(self, tmp_path):
        from click.testing import CliRunner

        from everyvoice_tpu.cli import main
        from everyvoice_tpu.dsp import write_wav

        sr = 16000
        audio = np.zeros(sr, np.float32)
        audio[: sr // 2] = 0.1
        wav_path = tmp_path / "a.wav"
        write_wav(wav_path, audio, sr)
        tg = tmp_path / "a.TextGrid"
        tg.write_text(
            segments_to_textgrid([("hello", 0.0, 0.5)], 1.0), encoding="utf8"
        )
        result = CliRunner().invoke(
            main,
            ["segment", "extract", str(wav_path), str(tg),
             "-o", str(tmp_path / "segs")],
        )
        assert result.exit_code == 0, result.output
        assert (tmp_path / "segs" / "metadata.psv").exists()

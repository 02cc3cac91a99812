"""CTC alignment + segmentation tests
(role parity: the wav2vec2aligner submodule's `segment align|extract`,
reference cli.py:25-37,392-415 — exercised here with a stub acoustic model
since no wav2vec2 weights ship with this environment)."""

from pathlib import Path

import numpy as np
import pytest

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

    def test_matches_per_cell_reference_dp(self):
        """The state-vectorized trellis must agree span-for-span with a
        straightforward per-(t,s) dynamic program on random inputs."""

        def reference_spans(log_probs, targets, blank_id=0):
            neg = -1e9
            ext = []
            for label in targets:
                ext += [blank_id, int(label)]
            ext.append(blank_id)
            t_max, s_max = len(log_probs), len(ext)
            trellis = np.full((t_max, s_max), neg, np.float64)
            back = np.zeros((t_max, s_max), np.int8)
            trellis[0, 0] = log_probs[0, ext[0]]
            if s_max > 1:
                trellis[0, 1] = log_probs[0, ext[1]]
            for t in range(1, t_max):
                for s in range(s_max):
                    best, move = trellis[t - 1, s], 0
                    if s > 0 and trellis[t - 1, s - 1] > best:
                        best, move = trellis[t - 1, s - 1], 1
                    if (s > 1 and ext[s] != blank_id and ext[s] != ext[s - 2]
                            and trellis[t - 1, s - 2] > best):
                        best, move = trellis[t - 1, s - 2], 2
                    trellis[t, s] = best + log_probs[t, ext[s]]
                    back[t, s] = move
            s = s_max - 1
            if s_max > 1 and trellis[-1, s_max - 2] > trellis[-1, s_max - 1]:
                s = s_max - 2
            path = np.zeros(t_max, np.int32)
            for t in range(t_max - 1, -1, -1):
                path[t] = s
                if t > 0:
                    s -= back[t, s]
            spans = []
            for i in range(len(targets)):
                frames = np.nonzero(path == 2 * i + 1)[0]
                if len(frames):
                    spans.append((i, int(frames[0]), int(frames[-1]) + 1))
                else:
                    prev_end = spans[-1][2] if spans else 0
                    spans.append((i, prev_end, prev_end))
            return spans

        rng = np.random.default_rng(7)
        for trial in range(5):
            t_max = int(rng.integers(20, 60))
            vocab = 8
            n_targets = int(rng.integers(2, 8))
            targets = rng.integers(1, vocab, n_targets).tolist()
            lp = np.log(rng.dirichlet(np.ones(vocab), size=t_max))
            assert ctc_forced_alignment(lp, targets) == reference_spans(
                lp, targets
            )

    @pytest.mark.slow
    def test_long_audio_scale(self):
        """An hour-scale trellis (50k frames x 400 labels) must run in
        seconds — this was a pure-Python double loop before."""
        import time

        rng = np.random.default_rng(0)
        lp = np.log(rng.dirichlet(np.ones(30), size=50_000)).astype(np.float32)
        targets = rng.integers(1, 30, 400).tolist()
        start = time.monotonic()
        spans = ctc_forced_alignment(lp, targets)
        elapsed = time.monotonic() - start
        assert len(spans) == 400
        assert elapsed < 30.0


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

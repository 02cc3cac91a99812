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


def _tiny_torch_wav2vec2(stable: bool = False, vocab_size: int = 12):
    """Random-init tiny HF Wav2Vec2ForCTC (no network): exercises the exact
    conversion path a user runs with locally staged checkpoints."""
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    torch.manual_seed(0)
    cfg = Wav2Vec2Config(
        vocab_size=vocab_size,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(16, 16, 16),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        feat_extract_norm="layer" if stable else "group",
        do_stable_layer_norm=stable,
        conv_bias=stable,
        layerdrop=0.0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
    )
    return Wav2Vec2ForCTC(cfg).eval(), cfg


class TestWav2Vec2Flax:
    """The flax Wav2Vec2CTC reproduces transformers.Wav2Vec2ForCTC on
    converted weights — so real checkpoints (wav2vec2-base-960h,
    large-robust alignment models) load and run on the TPU."""

    def _flax_from(self, cfg):
        from everyvoice_tpu.models.aligner.wav2vec2 import Wav2Vec2CTC

        return Wav2Vec2CTC(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            conv_dim=tuple(cfg.conv_dim),
            conv_kernel=tuple(cfg.conv_kernel),
            conv_stride=tuple(cfg.conv_stride),
            num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
            feat_extract_norm=cfg.feat_extract_norm,
            do_stable_layer_norm=cfg.do_stable_layer_norm,
            conv_bias=cfg.conv_bias,
        )

    @pytest.mark.parametrize("stable", [False, True])
    def test_parity_with_torch(self, stable):
        import jax.numpy as jnp
        import torch

        from everyvoice_tpu.models.aligner.wav2vec2 import (
            convert_torch_wav2vec2_state,
        )

        torch_model, cfg = _tiny_torch_wav2vec2(stable=stable)
        flax_model = self._flax_from(cfg)
        params = convert_torch_wav2vec2_state(
            torch_model.state_dict(), cfg.num_hidden_layers,
            cfg.feat_extract_norm, cfg.do_stable_layer_norm,
        )
        rng = np.random.default_rng(1)
        wav = rng.standard_normal((2, 2000)).astype(np.float32) * 0.1
        with torch.no_grad():
            ref = torch.log_softmax(
                torch_model(torch.from_numpy(wav)).logits, dim=-1
            ).numpy()
        got = np.asarray(flax_model.apply(params, jnp.asarray(wav)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_output_frames_matches_model(self):
        import jax
        import jax.numpy as jnp

        from everyvoice_tpu.models.aligner.wav2vec2 import Wav2Vec2CTC

        model = Wav2Vec2CTC(
            vocab_size=5, hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=16, conv_dim=(8, 8), conv_kernel=(10, 3),
            conv_stride=(5, 2), num_conv_pos_embeddings=8,
            num_conv_pos_embedding_groups=2,
        )
        wav = jnp.zeros((1, 1234))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), wav)
        out = model.apply(params, wav)
        assert out.shape[1] == model.output_frames(1234)
        assert model.total_stride == 10

    def test_windowed_single_window_is_exact(self):
        import jax
        import jax.numpy as jnp

        from everyvoice_tpu.models.aligner.wav2vec2 import (
            Wav2Vec2CTC,
            windowed_log_probs,
        )

        model = Wav2Vec2CTC(
            vocab_size=5, hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=16, conv_dim=(8, 8), conv_kernel=(10, 3),
            conv_stride=(5, 2), num_conv_pos_embeddings=8,
            num_conv_pos_embedding_groups=2,
        )
        rng = np.random.default_rng(2)
        audio = rng.standard_normal(8000).astype(np.float32)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 100))
        )
        full = np.asarray(model.apply(params, jnp.asarray(audio)[None]))[0]
        got = windowed_log_probs(
            model, params, audio, window_s=1.0, overlap_s=0.1
        )
        np.testing.assert_allclose(got, full, atol=1e-5)

    def test_windowed_long_audio_covers_all_frames(self):
        import jax
        import jax.numpy as jnp

        from everyvoice_tpu.models.aligner.wav2vec2 import (
            Wav2Vec2CTC,
            windowed_log_probs,
        )

        model = Wav2Vec2CTC(
            vocab_size=5, hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=16, conv_dim=(8, 8), conv_kernel=(10, 3),
            conv_stride=(5, 2), num_conv_pos_embeddings=8,
            num_conv_pos_embedding_groups=2,
        )
        rng = np.random.default_rng(3)
        # ~3.3 windows of 0.5 s at 16 kHz
        audio = rng.standard_normal(26500).astype(np.float32)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 100))
        )
        got = windowed_log_probs(
            model, params, audio, window_s=0.5, overlap_s=0.2
        )
        assert got.shape == (model.output_frames(len(audio)), 5)
        assert np.isfinite(got).all()
        # Every row was written (log-probs are never all-zero)
        assert (np.abs(got).sum(axis=1) > 0).all()
        # Interior frames agree with a full single pass: each stitched frame
        # had >= overlap/2 of true context on both sides, and this tiny
        # model's receptive field is well under that.
        full = np.asarray(model.apply(params, jnp.asarray(audio)[None]))[0]
        agree = (got.argmax(axis=1) == full.argmax(axis=1)).mean()
        assert agree > 0.9

    def test_align_long_audio_via_flax_loader(self, tmp_path):
        """End-to-end: a locally staged HF model directory drives
        `segment align` through the flax conversion path."""
        import json

        from transformers import (
            Wav2Vec2CTCTokenizer,
            Wav2Vec2FeatureExtractor,
            Wav2Vec2Processor,
        )

        from everyvoice_tpu.dsp import write_wav
        from everyvoice_tpu.models.aligner.segment import align_long_audio

        torch_model, _ = _tiny_torch_wav2vec2(vocab_size=30)
        model_dir = tmp_path / "w2v2-tiny"
        torch_model.save_pretrained(model_dir)
        vocab = {"<pad>": 0, "|": 1}
        for i, ch in enumerate("ABCDEFGHIJKLMNOPQRSTUVWXYZ'-", start=2):
            vocab[ch] = i
        vocab_file = model_dir / "vocab.json"
        vocab_file.write_text(json.dumps(vocab), encoding="utf8")
        tokenizer = Wav2Vec2CTCTokenizer(
            str(vocab_file), pad_token="<pad>", word_delimiter_token="|"
        )
        Wav2Vec2Processor(
            Wav2Vec2FeatureExtractor(do_normalize=True), tokenizer
        ).save_pretrained(model_dir)

        sr = 16000
        audio = (0.1 * np.sin(2 * np.pi * 150 * np.arange(sr) / sr)).astype(
            np.float32
        )
        wav_path = tmp_path / "a.wav"
        write_wav(wav_path, audio, sr)
        transcript = tmp_path / "t.txt"
        transcript.write_text("ab\ncd\n", encoding="utf8")
        tg = tmp_path / "a.TextGrid"
        segments = align_long_audio(
            wav_path, transcript, tg, acoustic_model=str(model_dir)
        )
        # Random acoustics: forced alignment still places both lines.
        assert [s[0] for s in segments] == ["ab", "cd"]
        assert tg.exists()

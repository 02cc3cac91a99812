"""Text→mel→wav synthesis pipeline
(role parity: fs2.cli.synthesize + synthesize_helper +
everyvoice/base_cli/prediction_writing_callback.py:14; output formats per
SynthesizeOutputFormats — wav, spec, textgrid, readalong-xml, readalong-html).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from everyvoice_tpu.logger import logger

OUTPUT_FORMATS = ("wav", "spec", "textgrid", "readalong-xml", "readalong-html")


def load_fs2_from_checkpoint(ckpt_path: Path | str,
                             compute_dtype: str = "float32"):
    """Rebuild (model, params, config, text_processor, lookups) from a
    checkpoint file.

    `compute_dtype` sets the Conformer/conv compute precision (params stay
    float32). Defaults to float32 for exact numerics (check-data loss
    scoring, teacher-forcing spec export); the `Synthesizer` serving path
    requests bfloat16 on TPU."""
    from everyvoice_tpu.models.fs2.config import FastSpeech2Config
    from everyvoice_tpu.models.fs2.model import FastSpeech2
    from everyvoice_tpu.text import TextProcessor
    from everyvoice_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(ckpt_path)
    if ckpt["model_info"]["name"] != "FastSpeech2":
        raise ValueError(
            f"Expected a FastSpeech2 checkpoint, got {ckpt['model_info']['name']}"
        )
    hp = ckpt["hyper_parameters"]
    config = FastSpeech2Config(**hp["config"])
    lang2id = hp.get("lang2id", {})
    speaker2id = hp.get("speaker2id", {})
    text_processor = TextProcessor(
        config.text,
        target_text_representation_level=config.model.target_text_representation_level,
    )
    model = FastSpeech2.from_config(
        config,
        n_symbols=len(text_processor.symbols),
        n_speakers=max(len(speaker2id), 1),
        n_langs=max(len(lang2id), 1),
        compute_dtype=compute_dtype,
    )
    import jax

    # Device-resident once at load: checkpoint tensors arrive as host numpy
    # arrays, and passing those to jitted calls would re-upload the whole
    # model on every invocation.
    params = jax.device_put(ckpt["state_dict"])
    return model, params, config, text_processor, lang2id, speaker2id


def load_vocoder_from_checkpoint(ckpt_path: Path | str,
                                 compute_dtype: str = "auto"):
    """Load a HiFiGAN (full) or HiFiGANGenerator (exported) checkpoint
    (parity: hfgl load_hifigan_from_checkpoint, demo/app.py:28-33).

    Serving resolves 'auto' to bfloat16 convolution compute on TPU (params
    stay float32 — standard TPU inference practice, ~1.4x faster on the
    MXU) and exact float32 on CPU."""
    from everyvoice_tpu.models.hifigan.config import HiFiGANConfig
    from everyvoice_tpu.models.hifigan.model import HiFiGANGenerator
    from everyvoice_tpu.train.checkpoint import load_checkpoint
    from everyvoice_tpu.utils.precision import resolve_compute_dtype

    compute_dtype = resolve_compute_dtype(compute_dtype)

    ckpt = load_checkpoint(ckpt_path)
    name = ckpt["model_info"]["name"]
    config = HiFiGANConfig(**ckpt["hyper_parameters"]["config"])
    generator = HiFiGANGenerator.from_config(
        config, compute_dtype=compute_dtype
    )
    state = ckpt["state_dict"]
    if name == "HiFiGAN":
        params = state["generator"]
    elif name == "HiFiGANGenerator":
        params = state
    else:
        raise ValueError(f"Expected a vocoder checkpoint, got {name}")
    import jax

    return generator, jax.device_put(params), config


def export_generator(full_ckpt: Path | str, out_path: Path | str) -> Path:
    """Strip discriminators/optimizers for serving
    (parity: `everyvoice export spec-to-wav`, reference cli.py:371-390)."""
    from everyvoice_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    ckpt = load_checkpoint(full_ckpt)
    if ckpt["model_info"]["name"] != "HiFiGAN":
        raise ValueError("export expects a full HiFiGAN training checkpoint")
    return save_checkpoint(
        out_path,
        "HiFiGANGenerator",
        ckpt["hyper_parameters"]["config"],
        ckpt["state_dict"]["generator"],
        step=ckpt.get("global_step", 0),
        lang2id=ckpt["hyper_parameters"].get("lang2id"),
        speaker2id=ckpt["hyper_parameters"].get("speaker2id"),
        stats=ckpt["hyper_parameters"].get("stats"),
    )


class Synthesizer:
    """Batched text→wav synthesis with length bucketing, jitted end to end."""

    def __init__(
        self,
        fs2_checkpoint: Path | str,
        vocoder_checkpoint: Optional[Path | str] = None,
        compute_dtype: str = "auto",
    ):
        import jax

        from everyvoice_tpu.utils.precision import resolve_compute_dtype

        # Deployment precision: bf16 conv/matmul compute on TPU (params stay
        # float32, ~1.4x faster on the MXU), exact float32 on CPU.
        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        (
            self.model, self.params, self.config, self.text_processor,
            self.lang2id, self.speaker2id,
        ) = load_fs2_from_checkpoint(
            fs2_checkpoint, compute_dtype=self.compute_dtype
        )
        self.vocoder = None
        self.vocoder_params = None
        self.vocoder_config = None
        if vocoder_checkpoint is not None:
            self.vocoder, self.vocoder_params, self.vocoder_config = (
                load_vocoder_from_checkpoint(
                    vocoder_checkpoint, compute_dtype=self.compute_dtype
                )
            )
        self._jit_cache: dict = {}
        self._jax = jax

    # -- encoding --------------------------------------------------------
    def encode(self, text: str, lang_id: Optional[str]) -> list:
        level = self.config.model.target_text_representation_level.value
        apply_g2p = level != "characters"
        chunks = [text]
        if self.config.text.split_text:
            from everyvoice_tpu.text.textsplit import chunk_text

            boundaries = self.config.text.boundaries.get(lang_id or "")
            kwargs = {}
            if boundaries is not None:
                kwargs = dict(
                    strong_boundaries=boundaries.strong,
                    weak_boundaries=boundaries.weak,
                )
            chunks = chunk_text(text, **kwargs) or [text]
        encoded = []
        for chunk in chunks:
            ids = self.text_processor.encode_text(
                chunk, apply_g2p=apply_g2p, lang_id=lang_id, quiet=True,
            )
            if len(ids):
                encoded.append(np.asarray(ids, np.int32))
        return encoded

    # -- jitted forward ---------------------------------------------------
    def _forward(self, n_text: int, with_style: bool = False):
        key = (n_text, with_style)
        if key in self._jit_cache:
            return self._jit_cache[key]
        import jax
        from functools import partial

        model = self.model
        vocoder = self.vocoder

        # Parameters are jit ARGUMENTS, not closure captures: captured
        # params are baked into the executable as constants, which bloats
        # it by the full model size (hundreds of MB), defeats the
        # persistent compile cache across processes, and re-ships weights
        # with every compiled shape variant.
        def fn(params, vparams, text, lengths, speaker_id, language_id,
               duration_control, style_reference=None):
            out = model.apply(
                params, text, lengths,
                speaker_id=speaker_id, language_id=language_id,
                duration_control=duration_control,
                style_reference=style_reference,
            )
            mel = out["postnet_mel"] if "postnet_mel" in out else out["mel"]
            frames = out["predicted_frame_lengths"]
            durations = out["duration_used"]
            if vocoder is not None:
                wav = vocoder.apply(vparams, mel)
                return mel, frames, durations, wav
            return mel, frames, durations, None

        jitted = jax.jit(fn)
        bound = partial(jitted, self.params, self.vocoder_params)
        self._jit_cache[key] = bound
        return bound

    def load_style_reference(self, wav_path: Path | str):
        """Reference wav → log-mel (1, T, M) for the GST module."""
        import jax.numpy as jnp

        from everyvoice_tpu.dsp import get_spectral_transform, read_wav, resample
        from everyvoice_tpu.dsp.spectral import dynamic_range_compression

        a = self.config.preprocessing.audio
        audio, sr = read_wav(wav_path)
        mono = jnp.asarray(audio.mean(axis=0))
        if sr != a.input_sampling_rate:
            mono = resample(mono, sr, a.input_sampling_rate)
        spec_type = a.spec_type if isinstance(a.spec_type, str) else a.spec_type.value
        mel_fn = get_spectral_transform(
            spec_type, a.n_fft, a.fft_window_size, a.fft_hop_size,
            a.input_sampling_rate, a.n_mels, a.f_min, a.f_max,
        )
        return dynamic_range_compression(mel_fn(mono)).T[None, ...]

    def synthesize(
        self,
        texts: Sequence[str],
        language: Optional[str] = None,
        speaker: Optional[str] = None,
        duration_control: float = 1.0,
        style_reference: Optional[Path] = None,
        batch_size: int = 16,
    ) -> list:
        """Returns one result dict per input text, in order: {text,
        mel (T,M) | None, wav | None, durations, tokens}. A text with no
        valid symbols yields mel=None (so results stay index-aligned with
        the caller's basenames).

        Chunks from ALL texts are bucketed by padded token length and
        dispatched in padded batches of up to `batch_size`, so a filelist
        synthesis runs a handful of large MXU-friendly programs instead of
        one dispatch per sentence (the batched path bench.py measures)."""
        import jax.numpy as jnp

        lang_for_g2p = language
        # An explicit unknown name is a hard error — silently mapping a
        # typo'd --speaker to id 0 synthesizes the wrong voice.
        if speaker is not None and self.speaker2id and speaker not in self.speaker2id:
            raise ValueError(
                f"Unknown speaker '{speaker}'; valid speakers: "
                f"{sorted(self.speaker2id)}"
            )
        if language is not None and self.lang2id and language not in self.lang2id:
            raise ValueError(
                f"Unknown language '{language}'; valid languages: "
                f"{sorted(self.lang2id)}"
            )
        speaker_id = self.speaker2id.get(speaker or "default", 0)
        language_id = self.lang2id.get(language or "default", 0)
        style_mel = (
            self.load_style_reference(style_reference)
            if style_reference is not None
            else None
        )
        # ---- encode every text; flatten chunks with their origin indices
        chunk_entries: list = []  # (text_idx, chunk_idx, ids)
        n_chunks_per_text: list = []
        for ti, text in enumerate(texts):
            chunks = self.encode(text, lang_for_g2p)
            if not chunks:
                logger.warning(f"No valid symbols found in '{text}'; skipping.")
            n_chunks_per_text.append(len(chunks))
            for ci, ids in enumerate(chunks):
                chunk_entries.append((ti, ci, ids))

        # ---- bucket by padded token length, dispatch padded batches
        from collections import defaultdict

        buckets: dict = defaultdict(list)
        for entry in chunk_entries:
            n = int(2 ** np.ceil(np.log2(max(len(entry[2]), 16))))
            buckets[n].append(entry)
        hop_total = self._samples_per_frame()
        chunk_out: dict = {}  # (text_idx, chunk_idx) -> (mel, dur, ids, wav)
        for n, group in sorted(buckets.items()):
            fn = self._forward(n, with_style=style_mel is not None)
            for off in range(0, len(group), batch_size):
                sl = group[off : off + batch_size]
                # Pad the batch dim to a power of two (≤ batch_size) so the
                # compile count stays logarithmic in batch size.
                b = int(2 ** np.ceil(np.log2(len(sl))))
                b = max(min(b, batch_size), len(sl))
                padded = np.zeros((b, n), np.int32)
                lengths = np.ones((b,), np.int32)
                for j, (_, _, ids) in enumerate(sl):
                    padded[j, : len(ids)] = ids
                    lengths[j] = len(ids)
                extra = ()
                if style_mel is not None:
                    extra = (jnp.broadcast_to(
                        style_mel, (b,) + style_mel.shape[1:]
                    ),)
                mel, frames, durations, wav = fn(
                    jnp.asarray(padded),
                    jnp.asarray(lengths),
                    jnp.full((b,), speaker_id, np.int32),
                    jnp.full((b,), language_id, np.int32),
                    duration_control,
                    *extra,
                )
                # One fused host transfer per batch — sequential np.asarray
                # fetches each pay a device round trip (see the StyleTTS2
                # serving fix; docs/guides/tpu.md).
                import jax

                mel, frames, durations, wav = jax.device_get(
                    (mel, frames, durations, wav)
                )
                for j, (ti, ci, ids) in enumerate(sl):
                    n_frames = max(min(int(frames[j]), mel.shape[1]), 1)
                    chunk_out[(ti, ci)] = (
                        mel[j, :n_frames],
                        durations[j, : len(ids)],
                        ids,
                        wav[j, : n_frames * hop_total]
                        if wav is not None
                        else None,
                    )

        # ---- reassemble per-text results in order
        results = []
        for ti, text in enumerate(texts):
            n_chunks = n_chunks_per_text[ti]
            if n_chunks == 0:
                results.append(
                    {"text": text, "mel": None, "wav": None,
                     "durations": [], "tokens": []}
                )
                continue
            parts = [chunk_out[(ti, ci)] for ci in range(n_chunks)]
            wavs = [p[3] for p in parts if p[3] is not None]
            results.append(
                {
                    "text": text,
                    "mel": np.concatenate([p[0] for p in parts], axis=0),
                    "wav": np.concatenate(wavs) if wavs else None,
                    "durations": [p[1] for p in parts],
                    "tokens": [p[2] for p in parts],
                }
            )
        return results

    def _samples_per_frame(self) -> int:
        a = self.config.preprocessing.audio
        return a.fft_hop_size * (
            a.output_sampling_rate // a.input_sampling_rate
        )

    # -- writers ----------------------------------------------------------
    def write_outputs(
        self,
        results: list,
        output_dir: Path | str,
        output_types: Sequence[str] = ("wav",),
        language: Optional[str] = None,
        speaker: Optional[str] = None,
        basenames: Optional[Sequence[str]] = None,
    ) -> list:
        from everyvoice_tpu.utils import slugify, truncate_basename

        output_dir = Path(output_dir)
        written = []
        sr = self.config.preprocessing.audio.output_sampling_rate
        hop_s = self._samples_per_frame() / sr
        for i, res in enumerate(results):
            if res["mel"] is None:
                continue  # text had no valid symbols (warned at synthesis)
            if basenames is not None and i < len(basenames):
                base = basenames[i]
            else:
                base = truncate_basename(slugify(res["text"]))
            stem = f"{base}--{speaker or 'default'}--{language or 'default'}"
            if "wav" in output_types and res["wav"] is not None:
                from everyvoice_tpu.dsp import write_wav

                path = output_dir / "wav" / f"{stem}.wav"
                path.parent.mkdir(parents=True, exist_ok=True)
                write_wav(path, res["wav"], sr)
                written.append(path)
            if "spec" in output_types:
                path = output_dir / "synthesized_spec" / f"{stem}--spec-pred.npy"
                path.parent.mkdir(parents=True, exist_ok=True)
                np.save(path, res["mel"].T)  # (M, T) like preprocessed specs
                written.append(path)
            if "textgrid" in output_types:
                path = output_dir / "textgrids" / f"{stem}.TextGrid"
                path.parent.mkdir(parents=True, exist_ok=True)
                path.write_text(
                    self._to_textgrid(res, hop_s), encoding="utf8"
                )
                written.append(path)
            if "readalong-xml" in output_types or "readalong-html" in output_types:
                ras_dir = output_dir / "readalongs"
                ras_dir.mkdir(parents=True, exist_ok=True)
                xml = self._to_readalong(res, hop_s)
                if "readalong-xml" in output_types:
                    path = ras_dir / f"{stem}.readalong"
                    path.write_text(xml, encoding="utf8")
                    written.append(path)
                if "readalong-html" in output_types:
                    path = ras_dir / f"{stem}.html"
                    path.write_text(self._readalong_html(xml, stem), encoding="utf8")
                    written.append(path)
        return written

    def _token_intervals(self, res: dict, hop_s: float):
        t = 0.0
        for ids, durations in zip(res["tokens"], res["durations"]):
            tokens = self.text_processor.token_sequence_to_text_sequence(
                [int(x) for x in ids]
            )
            for token, dur in zip(tokens, durations):
                start, end = t, t + float(dur) * hop_s
                yield token, start, end
                t = end

    def _to_textgrid(self, res: dict, hop_s: float) -> str:
        intervals = list(self._token_intervals(res, hop_s))
        total = intervals[-1][2] if intervals else 0.0
        lines = [
            'File type = "ooTextFile"',
            'Object class = "TextGrid"',
            "",
            "xmin = 0",
            f"xmax = {total:.6f}",
            "tiers? <exists>",
            "size = 1",
            "item []:",
            "    item [1]:",
            '        class = "IntervalTier"',
            '        name = "tokens"',
            "        xmin = 0",
            f"        xmax = {total:.6f}",
            f"        intervals: size = {len(intervals)}",
        ]
        for i, (token, start, end) in enumerate(intervals, start=1):
            escaped = token.replace('"', '""')
            lines += [
                f"        intervals [{i}]:",
                f"            xmin = {start:.6f}",
                f"            xmax = {end:.6f}",
                f'            text = "{escaped}"',
            ]
        return "\n".join(lines) + "\n"

    def _to_readalong(self, res: dict, hop_s: float) -> str:
        from xml.sax.saxutils import escape

        words = []
        for wi, (token, start, end) in enumerate(self._token_intervals(res, hop_s)):
            words.append(
                f'      <w id="t{wi}" time="{start:.3f}" dur="{end - start:.3f}">'
                f"{escape(token)}</w>"
            )
        body = "\n".join(words)
        return (
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<read-along version="1.0">\n  <text>\n    <body>\n'
            f'      <div type="page">\n      <p>\n      <s>\n{body}\n'
            "      </s>\n      </p>\n      </div>\n"
            "    </body>\n  </text>\n</read-along>\n"
        )

    @staticmethod
    def _readalong_html(xml: str, stem: str) -> str:
        from xml.sax.saxutils import escape

        return (
            "<!DOCTYPE html>\n<html>\n<head><meta charset='utf-8'>"
            f"<title>{escape(stem)}</title></head>\n<body>\n"
            f"<read-along href='{escape(stem)}.readalong' "
            f"audio='../wav/{escape(stem)}.wav'></read-along>\n"
            "<script type='module' src='https://unpkg.com/"
            "@readalongs/web-component@^1.4.0/dist/web-component/"
            "web-component.esm.js'></script>\n</body>\n</html>\n"
        )


def synthesize_teacher_forced_specs(
    fs2_checkpoint: Path | str,
    filelist: list,
    config,
    output_dir: Optional[Path] = None,
) -> int:
    """Write teacher-forced predicted mels to `synthesized_spec/` for vocoder
    matching (reference finetune flow, docs/guides/finetune.md:23-43)."""
    import jax.numpy as jnp

    from everyvoice_tpu.dataloader import FastSpeech2Dataset

    model, params, ckpt_config, text_processor, lang2id, speaker2id = (
        load_fs2_from_checkpoint(fs2_checkpoint)
    )
    config = config or ckpt_config
    dataset = FastSpeech2Dataset(
        filelist, config, lang2id, speaker2id, text_processor=text_processor
    )
    out_root = Path(output_dir or config.preprocessing.save_dir) / "synthesized_spec"
    out_root.mkdir(parents=True, exist_ok=True)
    count = 0
    spec_type = config.preprocessing.audio.spec_type
    if not isinstance(spec_type, str):
        spec_type = spec_type.value
    sr = config.preprocessing.audio.input_sampling_rate
    for batch in dataset.batches(8, shuffle=False):
        basenames = batch.pop("basenames")
        out = model.apply(
            params,
            jnp.asarray(batch["text"]),
            jnp.asarray(batch["text_lengths"]),
            mel=jnp.asarray(batch["mel"]),
            mel_lengths=jnp.asarray(batch["mel_lengths"]),
            attn_prior=(
                jnp.asarray(batch["attn_prior"]) if "attn_prior" in batch else None
            ),
            pitch=jnp.asarray(batch["pitch"]),
            energy=jnp.asarray(batch["energy"]),
            speaker_id=jnp.asarray(batch["speaker_id"]),
            language_id=jnp.asarray(batch["language_id"]),
            teacher_forcing=True,
        )
        mel = np.asarray(out.get("postnet_mel", out["mel"]))
        for i, base in enumerate(basenames):
            # The final ragged batch is padded by repeating the last item
            # (basenames included), so stop at the corpus size — the guard
            # must be on items written, not on batch row count.
            if count >= len(dataset.items):
                break
            n = int(batch["mel_lengths"][i])
            item = dataset.items[count]
            speaker = item.get("speaker") or "default"
            language = item.get("language") or "default"
            np.save(
                out_root / f"{base}--{speaker}--{language}--spec-{sr}-{spec_type}.npy",
                mel[i, :n].T,
            )
            count += 1
    return count

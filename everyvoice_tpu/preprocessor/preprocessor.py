"""Batched on-device preprocessing pipeline
(behavioral parity: everyvoice/preprocessor/preprocessor.py:67-1321; see
SURVEY.md §2.2 for the step-by-step contract).

Where the reference runs a joblib process pool with one CPU pass per file,
this pipeline:

1. loads and validates audio on host (constraints: ≤2 channels,
   0.4–11 s, ≥−36 LUFS — loudness itself computed on device),
2. buckets utterances by length, pads each bucket to a static shape, and
3. runs ONE jitted XLA program per bucket that computes the log-mel
   spectrogram, frame energy, and F0 for the whole batch at once —
   the MXU does in microseconds per utterance what pyworld did in
   hundreds of milliseconds.

Artifact layout and filenames match the reference
(`{save_dir}/{audio,spec,attn,energy,pitch,pfs,duration}/` with
`basename--speaker--language--<feature>` names, sep `--`,
preprocessor.py:502-508) with `.npy` tensors instead of torch `.pt`.
"""

from __future__ import annotations

import json
import random
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from everyvoice_tpu.config.type_definitions import DatasetTextRepresentation
from everyvoice_tpu.logger import logger
from everyvoice_tpu.preprocessor.helpers import (
    Counters,
    Scaler,
    read_config_lock,
    write_config_lock,
)
from everyvoice_tpu.utils import n_times, write_filelist

PROCESSING_ORDER = ("audio", "text", "pfs", "spec", "attn", "energy", "pitch")
FILENAME_SEP = "--"
# Pad audio lengths up to power-of-two frame counts (min 128 frames), so
# the whole corpus compiles at most ~4 feature-program shapes (e.g. 3.7 s
# fits 256 frames, 11 s fits 1024). The extra arithmetic on pad zeros is
# microseconds per batch; an XLA compile is seconds — trading dense FLOPs
# for fewer shapes is strictly a win here. Combined with the persistent
# compilation cache, re-runs pay zero compiles.
BUCKET_FRAMES = 128


class Preprocessor:
    def __init__(self, config):
        # Accepts FastSpeech2Config / HiFiGANConfig / any config exposing
        # .preprocessing (and optionally .text).
        self.config = config
        self.preprocessing_config = config.preprocessing
        self.audio_config = config.preprocessing.audio
        self.datasets = config.preprocessing.source_data
        self.save_dir = Path(config.preprocessing.save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.counters = Counters()
        self.missing_files_list: list = []
        self.multichannel_files_list: list = []
        self.overwrite = False
        # Energy/pitch artifact paths written THIS run (raw, not yet
        # normalized) — the stats step normalizes exactly these; files
        # from earlier completed runs are already z-scored.
        self._features_written: dict = {"energy": [], "pitch": []}
        self.input_sampling_rate = self.audio_config.input_sampling_rate
        self.output_sampling_rate = self.audio_config.output_sampling_rate
        self.sampling_rate_change = (
            self.output_sampling_rate // self.input_sampling_rate
        )
        self.output_hop_size = (
            self.sampling_rate_change * self.audio_config.fft_hop_size
        )
        text_config = getattr(config, "text", None)
        if text_config is not None:
            from everyvoice_tpu.text import TextProcessor

            self.text_processor: Optional[TextProcessor] = TextProcessor(text_config)
        else:
            self.text_processor = None

    # ------------------------------------------------------------------
    # paths

    def create_path(self, item: dict, folder: str, fn: str) -> Path:
        return (
            self.save_dir
            / folder
            / FILENAME_SEP.join(
                [item["basename"], item["speaker"], item["language"], fn]
            )
        )

    @staticmethod
    def get_speaker_and_language(item: dict) -> dict:
        out = dict(item)
        if not out.get("speaker"):
            out["speaker"] = "default"
        if not out.get("language"):
            out["language"] = "default"
        return out

    def load_filelist(self, path: Path) -> list:
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        return generic_psv_filelist_reader(path)

    def _spec_type_str(self) -> str:
        """spec_type as a plain string (the config field may be an enum)."""
        spec_type = self.audio_config.spec_type
        return spec_type if isinstance(spec_type, str) else spec_type.value

    def _spec_filename(self) -> str:
        """Canonical spec artifact filename — the single source of truth;
        the writer (process_features_batched) and every reader
        (process_attn_prior, the datasets) must agree byte-for-byte."""
        return f"spec-{self.input_sampling_rate}-{self._spec_type_str()}.npy"

    # ------------------------------------------------------------------
    # audio

    def _load_conditioned_audio(
        self,
        wav_path: Path,
        sox_effects: Optional[list] = None,
        update_counters: bool = True,
        skip_loudness: bool = False,
    ):
        """Decode + validate + apply effects ONCE at the native rate
        (constraints per reference preprocessor.py:131-218). Returns
        (audio (C, T) np, sr) or None if rejected. Rate-specific work
        (resample/normalize/hop-truncate) happens in _finalize_audio so a
        dual-rate config decodes and gates each file once, not per rate.

        Everything here runs on the host: one scalar gate per
        arbitrary-length file is exactly the shape-polymorphic work XLA is
        worst at (each unique length would compile a fresh program), while
        the numpy/scipy versions cost ~1 ms per clip and parallelize across
        the audio thread pool. The device DSP earns its keep in the
        bucket-padded batched feature pass, not here."""
        from everyvoice_tpu.dsp import (
            apply_sox_effects,
            integrated_loudness_host,
            read_wav,
        )

        try:
            audio, sr = read_wav(wav_path)
        except FileNotFoundError:
            return None
        if audio.shape[0] > 2:
            logger.warning(
                f"Audio file '{wav_path}' has {audio.shape[0]} channels; only "
                "mono/stereo are supported — skipping."
            )
            if update_counters:
                self.counters.increment("multichannel")
            self.multichannel_files_list.append(str(wav_path))
            return None
        seconds = audio.shape[1] / sr
        if seconds > self.audio_config.max_audio_length:
            logger.warning(f"Audio too long: {wav_path} ({seconds:.2f} s) — skipping")
            if update_counters:
                self.counters.increment("audio_too_long")
            return None
        if seconds < self.audio_config.min_audio_length:
            logger.warning(f"Audio too short: {wav_path} ({seconds:.2f} s) — skipping")
            if update_counters:
                self.counters.increment("audio_too_short")
            return None

        if not skip_loudness:
            lufs = integrated_loudness_host(audio, sr)
            if np.isnan(lufs) or lufs < -36.0:
                logger.warning(
                    f"Audio empty (loudness {lufs:.1f}): {wav_path} — skipping"
                )
                if update_counters:
                    self.counters.increment("audio_empty")
                return None

        x = np.asarray(audio)
        if sox_effects:
            try:
                x, sr = apply_sox_effects(x, sr, sox_effects)
            except Exception as e:
                logger.warning(f"Audio-effect error on {wav_path}: {e}")
                if update_counters:
                    self.counters.increment("sox_error")
                return None
        if update_counters and not skip_loudness:
            # With skip_loudness the caller gates on device and counts
            # duration only for files that survive the gate.
            self.counters.increment("duration", seconds)
        return x, sr

    def _finalize_audio(self, x, sr, resample_rate: Optional[int],
                        hop_size: int, normalize: bool = True):
        """Rate-specific conditioning of an already validated (C, T) clip:
        resample, mixdown, peak-normalize ×0.95, truncate to a hop
        multiple. Host numpy throughout (see _load_conditioned_audio).
        Returns (audio float32 (T,), sr)."""
        from everyvoice_tpu.dsp import resample_host

        x = np.asarray(x)
        if resample_rate is not None and resample_rate != sr:
            x = resample_host(x, sr, resample_rate)
            sr = resample_rate
        if x.shape[0] > 1:  # effects may not have mixed down; do it here
            x = np.mean(x, axis=0, keepdims=True)
        if normalize:
            x = x / max(np.max(np.abs(x)), 1e-9) * 0.95
        x = np.asarray(x[0], dtype=np.float32)
        max_samples = (x.shape[0] // hop_size) * hop_size
        return x[:max_samples], sr

    def process_audio(
        self,
        wav_path: Path,
        normalize: bool = True,
        resample_rate: Optional[int] = None,
        sox_effects: Optional[list] = None,
        hop_size: Optional[int] = None,
        update_counters: bool = True,
    ):
        """Load + validate + condition one audio file. Returns
        (audio float32 (T,), sr) or (None, None) if rejected."""
        if hop_size is None:
            raise ValueError("hop size required: sample counts must divide evenly")
        cond = self._load_conditioned_audio(
            wav_path, sox_effects=sox_effects, update_counters=update_counters
        )
        if cond is None:
            return None, None
        x, sr = cond
        return self._finalize_audio(x, sr, resample_rate, hop_size, normalize)

    def process_one_audio(
        self, item: dict, data_dir: Path, sox_effects: list, dataset_label: str
    ) -> Optional[dict]:
        from everyvoice_tpu.dsp import write_wav

        extension = "" if item["basename"].endswith(".wav") else ".wav"
        audio_path = Path(data_dir) / (item["basename"] + extension)
        if not audio_path.exists():
            logger.warning(f"File '{audio_path}' is missing; not processed.")
            self.counters.increment("missing_files")
            self.missing_files_list.append(str(audio_path))
            return None
        item = self.get_speaker_and_language(item)
        item["label"] = dataset_label
        input_path = self.create_path(
            item, "audio", f"audio-{self.input_sampling_rate}.wav"
        )
        output_path = self.create_path(
            item, "audio", f"audio-{self.output_sampling_rate}.wav"
        )
        if input_path.exists() and output_path.exists() and not self.overwrite:
            self.counters.increment("previously_processed_files")
            return item
        need_input = not input_path.exists() or self.overwrite
        need_output = self.input_sampling_rate != self.output_sampling_rate and (
            not output_path.exists() or self.overwrite
        )
        # Decode + validate + apply effects once; only the rate-specific
        # finalization (resample/normalize/truncate) runs per target rate.
        cond = self._load_conditioned_audio(audio_path, sox_effects=sox_effects)
        if cond is None:
            return None
        x, native_sr = cond
        if need_input:
            audio, sr = self._finalize_audio(
                x, native_sr, self.input_sampling_rate,
                self.audio_config.fft_hop_size,
            )
            write_wav(input_path, audio, sr, self.audio_config.target_bit_depth)
        if need_output:
            audio, sr = self._finalize_audio(
                x, native_sr, self.output_sampling_rate, self.output_hop_size
            )
            write_wav(output_path, audio, sr, self.audio_config.target_bit_depth)
        self.counters.increment("processed_files")
        return item

    def process_all_audio(self, cpus: int = 1,
                          device_audio: Optional[bool] = None) -> list:
        """Validate/condition every audio file. With cpus > 1, file decode +
        write run on a thread pool — the native WAV codec releases the GIL, so
        this is real parallelism (replacing the reference's joblib/loky
        process pool, preprocessor.py:584-630).

        device_audio: move loudness gating, resampling, and peak
        normalization onto the accelerator as bucket-padded int16 batches
        (round-5 measurement in BASELINE.md). Decode, effects, and 16-bit
        saves stay on the C-threaded host path. Default (None/False) is the
        per-file host path: the measured trade is link-dependent — the
        device pass wins only when host CPU is scarce relative to the
        accelerator AND the link is local (PCIe-class); on this repo's dev
        relay the transfer dominates, and on many-core hosts the threaded
        host path already outruns it. The two paths produce identical
        artifacts to 1 int16 LSB (same sinc kernel — dsp/resample.py
        resample vs resample_host; pinned by tests/test_preprocessing.py
        ::TestDeviceAudioPath)."""
        (self.save_dir / "audio").mkdir(parents=True, exist_ok=True)
        # 'arpabet' must survive into the processed filelist: the text
        # stage converts it to IPA phones (reference: arpabet is "always
        # converted to IPA during preprocessing").
        keep = (
            "basename", "language", "speaker", "characters",
            "character_tokens", "phones", "phone_tokens", "arpabet", "label",
        )
        jobs = []
        for dataset in self.datasets:
            filelist = dataset.filelist_loader(dataset.filelist)
            for item in filelist:
                jobs.append(
                    (item, dataset.data_dir, dataset.sox_effects, dataset.label)
                )
        if device_audio:
            results = self._process_all_audio_device(jobs, cpus)
        else:

            def one(job):
                return self.process_one_audio(*job)

            if cpus > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=cpus) as pool:
                    results = list(pool.map(one, jobs))
            else:
                results = [one(job) for job in jobs]
        return [
            {k: v for k, v in result.items() if k in keep}
            for result in results
            if result is not None
        ]

    def _decode_for_device(self, item, data_dir, sox_effects, dataset_label):
        """Phase A of the batched audio pass: per-file host work only —
        decode, structural validation, effects, mixdown. The loudness gate
        moves to the device for mono files (the common case); stereo files
        are gated here pre-mixdown so the gate sees the same channel-summed
        energy the reference's does."""
        from everyvoice_tpu.dsp import integrated_loudness_host

        extension = "" if item["basename"].endswith(".wav") else ".wav"
        audio_path = Path(data_dir) / (item["basename"] + extension)
        if not audio_path.exists():
            logger.warning(f"File '{audio_path}' is missing; not processed.")
            self.counters.increment("missing_files")
            self.missing_files_list.append(str(audio_path))
            return None
        item = self.get_speaker_and_language(item)
        item["label"] = dataset_label
        input_path = self.create_path(
            item, "audio", f"audio-{self.input_sampling_rate}.wav"
        )
        output_path = self.create_path(
            item, "audio", f"audio-{self.output_sampling_rate}.wav"
        )
        if input_path.exists() and output_path.exists() and not self.overwrite:
            self.counters.increment("previously_processed_files")
            return ("done", item)
        cond = self._load_conditioned_audio(
            audio_path, sox_effects=sox_effects, skip_loudness=True,
        )
        if cond is None:
            return None
        x, native_sr = cond
        x = np.asarray(x, dtype=np.float32)
        pre_gated = False
        if x.shape[0] > 1:
            lufs = integrated_loudness_host(x, native_sr)
            if np.isnan(lufs) or lufs < -36.0:
                logger.warning(
                    f"Audio empty (loudness {lufs:.1f}): {audio_path} — "
                    "skipping"
                )
                self.counters.increment("audio_empty")
                return None
            pre_gated = True
            x = np.mean(x, axis=0, keepdims=True)
        need_input = not input_path.exists() or self.overwrite
        need_output = (
            self.input_sampling_rate != self.output_sampling_rate
            and (not output_path.exists() or self.overwrite)
        )
        return ("todo", item, x[0], int(native_sr), pre_gated,
                {"input": (need_input, input_path),
                 "output": (need_output, output_path)},
                str(audio_path))

    def _audio_program(self, native_sr: int, targets: tuple,
                       pcm16: bool = False):
        """Jitted (B, T) program: BS.1770 loudness + polyphase resample to
        each target rate + ×0.95 peak normalization. One program per
        (native rate, target set); jax.jit specializes per bucket shape.
        With pcm16, input arrives as int16 PCM (exact for decoded 16-bit
        wavs) and outputs return quantized to the artifact's own int16 grid
        — 4× fewer link bytes, identical written artifacts."""
        import jax
        import jax.numpy as jnp

        from everyvoice_tpu.dsp import integrated_loudness
        from everyvoice_tpu.dsp.resample import resample

        @jax.jit
        def program(batch):
            if pcm16:
                batch = batch.astype(jnp.float32) / 32768.0
            # (B, T) → (B, 1, T): each row is an independent mono clip
            # (2-D input would be read as one multi-channel clip).
            lufs = integrated_loudness(batch[:, None, :], native_sr)
            outs = []
            for target in targets:
                y = resample(batch, native_sr, target)
                peak = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
                y = y / jnp.maximum(peak, 1e-9) * 0.95
                if pcm16:
                    y = jnp.clip(
                        jnp.round(y * 32768.0), -32768, 32767
                    ).astype(jnp.int16)
                outs.append(y)
            return lufs, tuple(outs)

        return program

    def _process_all_audio_device(self, jobs, cpus: int) -> list:
        """Phases B/C of the batched audio pass: bucket-padded device
        conditioning + C-threaded 16-bit saves, double-buffered like
        process_features_batched."""
        from concurrent.futures import ThreadPoolExecutor
        from math import gcd

        import jax

        from everyvoice_tpu.dsp import write_wav

        workers = max(cpus, 1)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            decoded = list(pool.map(
                lambda j: self._decode_for_device(*j), jobs
            ))
        results: list = [None] * len(decoded)
        todo = []
        for i, entry in enumerate(decoded):
            if entry is None:
                continue
            if entry[0] == "done":
                results[i] = entry[1]
                continue
            todo.append((i,) + entry[1:])
        if not todo:
            return [r for r in results]

        targets = (self.input_sampling_rate,)
        if self.output_sampling_rate != self.input_sampling_rate:
            targets = (self.input_sampling_rate, self.output_sampling_rate)
        hops = {self.input_sampling_rate: self.audio_config.fft_hop_size,
                self.output_sampling_rate: self.output_hop_size}
        self.last_audio_transfer_bytes = {"up": 0, "down": 0}
        batch_size = 16
        bucket_samples = BUCKET_FRAMES * self.audio_config.fft_hop_size
        # int16 both ways when sources decode on the 16-bit grid (decoded
        # values are exactly i/32768) and artifacts are 16-bit: exact, and
        # 4× fewer link bytes than f32. The default channel-mixdown effect
        # is value-preserving for mono sources (and a stereo mixdown's
        # ±0.5-LSB quantization stays inside the artifact's own grid).
        def _grid_safe(effects) -> bool:
            if not effects:
                return True
            return [
                [str(part) for part in effect] for effect in effects
            ] == [["channels", "1"]]

        pcm16 = (
            self.audio_config.target_bit_depth == 16
            and all(_grid_safe(j[2]) for j in jobs)  # j[2] = sox_effects
        )

        by_rate: dict = {}
        for entry in todo:
            by_rate.setdefault(entry[3], []).append(entry)

        write_pool = ThreadPoolExecutor(max_workers=workers)
        write_futures = []

        def finish_chunk(chunk, fetched, native_sr):
            lufs, outs = fetched
            for row, entry in enumerate(chunk):
                idx, item, x, _, pre_gated, needs, path_str = entry
                if not pre_gated and (
                    np.isnan(lufs[row]) or lufs[row] < -36.0
                ):
                    logger.warning(
                        f"Audio empty (loudness {float(lufs[row]):.1f}): "
                        f"{path_str} — skipping"
                    )
                    self.counters.increment("audio_empty")
                    continue
                self.counters.increment("duration", len(x) / native_sr)
                for t_i, target in enumerate(targets):
                    key = "input" if target == self.input_sampling_rate \
                        else "output"
                    need, path = needs[key]
                    if not need:
                        continue
                    g = gcd(native_sr, target)
                    out_len = -(-len(x) * (target // g) // (native_sr // g))
                    y = np.asarray(outs[t_i][row][:out_len])
                    if y.dtype == np.int16:
                        # Device-quantized to the artifact's own grid;
                        # write_wav's round(y*32768) reproduces it exactly.
                        y = y.astype(np.float32) / 32768.0
                    hop = hops[target]
                    y = y[: (len(y) // hop) * hop]
                    write_futures.append(write_pool.submit(
                        write_wav, path, y, target,
                        self.audio_config.target_bit_depth,
                    ))
                self.counters.increment("processed_files")
                results[idx] = item

        for native_sr, group in by_rate.items():
            program = self._audio_program(native_sr, targets, pcm16=pcm16)
            group.sort(key=lambda e: len(e[2]))
            pending = None
            i = 0
            while i < len(group):
                chunk = group[i: i + batch_size]
                i += batch_size
                max_len = max(len(e[2]) for e in chunk)
                n_buckets = max(-(-max_len // bucket_samples), 1)
                n_buckets = 1 << (n_buckets - 1).bit_length()
                padded = n_buckets * bucket_samples
                dtype = np.int16 if pcm16 else np.float32
                batch = np.zeros((batch_size, padded), dtype)
                for j, e in enumerate(chunk):
                    if pcm16:
                        batch[j, : len(e[2])] = np.clip(
                            np.round(e[2] * 32768.0), -32768, 32767
                        ).astype(np.int16)
                    else:
                        batch[j, : len(e[2])] = e[2]
                out = program(batch)
                self.last_audio_transfer_bytes["up"] += batch.nbytes
                for leaf in jax.tree_util.tree_leaves(out):
                    self.last_audio_transfer_bytes["down"] += (
                        leaf.size * leaf.dtype.itemsize
                    )
                    try:
                        leaf.copy_to_host_async()
                    except (AttributeError, NotImplementedError):
                        pass
                if pending is not None:
                    finish_chunk(pending[0], jax.device_get(pending[1]),
                                 native_sr)
                pending = (chunk, out)
            if pending is not None:
                finish_chunk(pending[0], jax.device_get(pending[1]),
                             native_sr)
        for future in write_futures:
            future.result()
        write_pool.shutdown()
        return results

    # ------------------------------------------------------------------
    # text

    def process_text(self, item: dict, use_pfs: bool = False):
        """Tokenize characters and/or phones (applying arpabet→IPA and G2P as
        needed), mirroring reference preprocessor.py:742-868. Returns
        (character_tokens | None, phone_tokens | None, pfs | None)."""
        assert self.text_processor is not None
        from everyvoice_tpu.text import CHARACTER_JOINER, JOINER_SUBSTITUTION
        from everyvoice_tpu.text.phonemizer import AVAILABLE_G2P_ENGINES

        characters = phones = pfs = None
        dataset_label = item.get("label")
        lang = item.get("language") or None

        def join(tokens):
            return CHARACTER_JOINER.join(
                t.replace(CHARACTER_JOINER, JOINER_SUBSTITUTION) for t in tokens
            )

        if item.get("arpabet"):
            from everyvoice_tpu.text.arpabet import arpabet_to_ipa

            item = dict(item)
            item["phones"] = arpabet_to_ipa(item["arpabet"])
        if item.get("characters"):
            norm = self.text_processor.normalize_text(
                item["characters"], dataset_label=dataset_label, lang_id=lang
            )
            char_tokens = self.text_processor.apply_tokenization(
                norm, quiet=True
            )
            characters = join(char_tokens)
            # G2P from characters when the dataset has no phones column.
            if (
                not item.get("phones")
                and lang is not None
                and lang in AVAILABLE_G2P_ENGINES
            ):
                phone_tokens = self.text_processor.apply_g2p_and_tokenization(
                    norm, lang, quiet=True
                )
                phones = join(phone_tokens)
        if item.get("phones"):
            norm = self.text_processor.normalize_text(
                item["phones"], dataset_label=dataset_label, lang_id=lang
            )
            phone_tokens = self.text_processor.apply_tokenization(norm, quiet=True)
            phones = join(phone_tokens)
        if use_pfs and phones:
            tokens = self.text_processor.split_tokens(phones)
            pfs = self.text_processor.calculate_phonological_features(tokens)
        return characters, phones, pfs

    # ------------------------------------------------------------------
    # batched device features

    def _load_processed_audio(self, item: dict) -> Optional[np.ndarray]:
        from everyvoice_tpu.dsp import read_wav

        path = self.create_path(item, "audio", f"audio-{self.input_sampling_rate}.wav")
        if not path.exists():
            return None
        audio, _ = read_wav(path)
        return audio[0]

    def _feature_program(self):
        """Jitted program computing (log-mel, energy, f0) for a (B, T)
        batch. One program serves every length bucket — jax.jit specializes
        per input shape on its own."""
        import jax
        import jax.numpy as jnp

        from everyvoice_tpu.dsp import compute_energy, get_spectral_transform
        from everyvoice_tpu.dsp.pitch import estimate_f0
        from everyvoice_tpu.dsp.spectral import dynamic_range_compression

        a = self.audio_config
        spec_type = self._spec_type_str()
        # On TPU, the fused Pallas kernel computes the log-mel ~16x faster
        # than the composed XLA ops; fall back to XLA elsewhere or for
        # non-default spectrogram flavours.
        target_device = jax.config.jax_default_device or jax.devices()[0]
        use_pallas = (
            spec_type == "mel-librosa"
            and a.n_fft % a.fft_hop_size == 0
            and getattr(target_device, "platform", "cpu") == "tpu"
        )
        if use_pallas:
            from everyvoice_tpu.ops.mel_pallas import fused_log_mel

            def spec_pipeline(batch):
                return fused_log_mel(
                    batch, a.input_sampling_rate, a.n_fft, a.fft_window_size,
                    a.fft_hop_size, a.n_mels, float(a.f_min), float(a.f_max),
                )
        else:
            spec_fn = get_spectral_transform(
                spec_type, a.n_fft, a.fft_window_size, a.fft_hop_size,
                self.input_sampling_rate, a.n_mels, a.f_min, a.f_max,
            )

            def spec_pipeline(batch):
                return dynamic_range_compression(spec_fn(batch))

        pcm16 = self.audio_config.target_bit_depth == 16

        @jax.jit
        def program(batch):
            # With 16-bit audio artifacts (the default), batches arrive as
            # int16 PCM — their exact on-disk encoding (read_wav returns
            # i/32768, so round(x*32768) round-trips losslessly): half the
            # host->device bytes of float32, converted on device where the
            # cast is free bandwidth-wise.
            if pcm16:
                batch = batch.astype(jnp.float32) / 32768.0
            spec = spec_pipeline(batch)
            energy = compute_energy(spec)
            f0 = estimate_f0(
                batch, self.input_sampling_rate, a.fft_hop_size
            )
            return spec, energy, f0

        return program

    def process_features_batched(
        self,
        filelist: list,
        want: Sequence[str] = ("spec", "energy", "pitch"),
        batch_size: int = 16,
    ) -> None:
        """The hot path: bucket → pad → one XLA call per batch → write
        per-item artifacts trimmed to their true frame counts."""
        hop = self.audio_config.fft_hop_size
        bucket_samples = BUCKET_FRAMES * hop

        artifact_names = {
            "spec": self._spec_filename(),
            "energy": "energy.npy",
            "pitch": "pitch.npy",
        }
        todo = []
        for item in filelist:
            item = self.get_speaker_and_language(item)
            paths = {
                w: self.create_path(item, w, artifact_names[w]) for w in want
            }
            if not self.overwrite and all(
                p.exists() for p in paths.values()
            ):
                # Incremental re-run: every wanted artifact exists — skip
                # the audio read AND the device pass, not just the write.
                continue
            audio = self._load_processed_audio(item)
            if audio is None:
                self.counters.increment("missing_files")
                continue
            todo.append((item, audio, paths))
        if not todo:
            return
        # Sort by length so buckets are dense.
        todo.sort(key=lambda entry: len(entry[1]))

        import jax

        program = self._feature_program()
        # Host<->device transfer accounting (padded shapes as actually
        # shipped), for benchmark reporting: relay-vs-production projections
        # need the real byte counts.
        self.last_transfer_bytes = {"up": 0, "down": 0}

        def write_outputs(chunk, outputs) -> None:
            # One fused transfer per batch (three sequential np.asarray
            # fetches would each pay a device round trip).
            spec, energy, f0 = jax.device_get(outputs)
            for j, (item, a, paths) in enumerate(chunk):
                n_frames = len(a) // hop  # drop the center-pad extra frame to
                # keep the reference's frames == samples//hop contract
                if "spec" in want:
                    path = paths["spec"]
                    if self.overwrite or not path.exists():
                        np.save(path, spec[j, :, :n_frames], allow_pickle=False)
                if "energy" in want:
                    path = paths["energy"]
                    if self.overwrite or not path.exists():
                        np.save(path, energy[j, :n_frames], allow_pickle=False)
                        self._features_written["energy"].append(path)
                if "pitch" in want:
                    path = paths["pitch"]
                    if self.overwrite or not path.exists():
                        np.save(path, f0[j, :n_frames], allow_pickle=False)
                        self._features_written["pitch"].append(path)

        # Double-buffered loop: dispatch batch i+1 and queue its async
        # device->host copy before fetching batch i, so device compute,
        # result transfer, and host artifact writes all overlap.
        pending = None  # (chunk, device outputs) awaiting fetch + write
        i = 0
        while i < len(todo):
            chunk = todo[i : i + batch_size]
            i += batch_size
            max_len = max(len(a) for _, a, _ in chunk)
            n_buckets = max(-(-max_len // bucket_samples), 1)
            n_buckets = 1 << (n_buckets - 1).bit_length()  # next power of 2
            padded_len = n_buckets * bucket_samples
            pcm16 = self.audio_config.target_bit_depth == 16
            dtype = np.int16 if pcm16 else np.float32
            batch = np.zeros((batch_size, padded_len), dtype=dtype)
            for j, (_, a, _) in enumerate(chunk):
                if pcm16:
                    batch[j, : len(a)] = np.clip(
                        np.round(a * 32768.0), -32768, 32767
                    ).astype(np.int16)
                else:
                    batch[j, : len(a)] = a
            outputs = program(batch)
            self.last_transfer_bytes["up"] += batch.nbytes
            for leaf in outputs:
                self.last_transfer_bytes["down"] += (
                    leaf.size * leaf.dtype.itemsize
                )
            for leaf in outputs:
                try:
                    leaf.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    break  # backend without async copies: device_get blocks
            if pending is not None:
                write_outputs(*pending)
            pending = (chunk, outputs)
        if pending is not None:
            write_outputs(*pending)

    # ------------------------------------------------------------------
    # attention priors

    def process_attn_prior(self, item: dict) -> None:
        from everyvoice_tpu.dsp import BetaBinomialInterpolator

        assert self.text_processor is not None
        item = self.get_speaker_and_language(item)
        interp = BetaBinomialInterpolator()
        spec_path = self.create_path(item, "spec", self._spec_filename())
        if not spec_path.exists():
            return
        n_frames = np.load(spec_path, mmap_mode="r").shape[1]
        for column, rep in (
            ("character_tokens", DatasetTextRepresentation.characters.value),
            ("phone_tokens", DatasetTextRepresentation.ipa_phones.value),
        ):
            tokens_joined = item.get(column)
            if not tokens_joined:
                continue
            n_tokens = len(
                [
                    t
                    for t in self.text_processor.split_tokens(tokens_joined)
                    if t
                ]
            )
            if not n_tokens:
                continue
            path = self.create_path(item, "attn", f"{rep}-attn-prior.npy")
            if path.exists() and not self.overwrite:
                continue
            np.save(path, interp(n_frames, n_tokens), allow_pickle=False)

    # ------------------------------------------------------------------
    # stats

    def compute_stats(self, energy: bool = True, pitch: bool = True):
        energy_scaler = Scaler() if energy else None
        pitch_scaler = Scaler() if pitch else None
        if energy_scaler is not None:
            for path in sorted((self.save_dir / "energy").glob("*energy*")):
                energy_scaler.append(np.load(path))
        if pitch_scaler is not None:
            for path in sorted((self.save_dir / "pitch").glob("*pitch*")):
                pitch_scaler.append(np.load(path))
        return energy_scaler, pitch_scaler

    def normalize_stats(self, energy_scaler, pitch_scaler) -> dict:
        stats = {}
        if energy_scaler and len(energy_scaler):
            stats["energy"] = energy_scaler.calculate_stats()
            for path in sorted((self.save_dir / "energy").glob("*energy*")):
                np.save(path, energy_scaler.normalize(np.load(path)))
        if pitch_scaler and len(pitch_scaler):
            stats["pitch"] = pitch_scaler.calculate_stats()
            for path in sorted((self.save_dir / "pitch").glob("*pitch*")):
                np.save(path, pitch_scaler.normalize(np.load(path)))
        return stats

    # ------------------------------------------------------------------
    # lock

    def _config_summary(self) -> dict:
        return {
            "audio": self.config.preprocessing.audio.model_checkpoint_dump(),
            "dataset": self.config.preprocessing.dataset,
        }

    def config_lock_has_conflicts(self) -> bool:
        lock = read_config_lock(self.save_dir)
        if lock is None:
            return False
        if lock.get("status") == "in progress":
            return True
        return lock.get("config") != self._config_summary()

    def save_config_lock(self, in_progress: bool) -> None:
        write_config_lock(
            self.save_dir,
            self._config_summary(),
            "in progress" if in_progress else "completed",
        )

    # ------------------------------------------------------------------
    # orchestration

    def preprocess(
        self,
        output_path: str = "filelist.psv",
        cpus: int = 1,
        to_process: Sequence[str] = (),
        overwrite: bool = False,
        debug: bool = False,
        device_audio: bool = False,
    ) -> None:
        self.overwrite = overwrite
        self._features_written = {"energy": [], "pitch": []}
        if not overwrite and self.config_lock_has_conflicts():
            raise RuntimeError(
                "Config lock mismatch: these files were preprocessed with a "
                "different configuration. Use overwrite to reprocess."
            )
        self.save_config_lock(in_progress=True)
        random.seed(self.preprocessing_config.dataset_split_seed)
        processed_filelist = self.save_dir / Path(output_path).name

        import time as _time

        step_seconds: dict = {}
        for process in PROCESSING_ORDER:
            if process not in to_process:
                continue
            _t0 = _time.perf_counter()
            if process != "text":
                (self.save_dir / process).mkdir(parents=True, exist_ok=True)
            if process == "audio":
                filelist = self.process_all_audio(
                    cpus=max(cpus, 1), device_audio=device_audio
                )
                # Reports are written even when every file was filtered out,
                # so a failed run still leaves its diagnostics behind.
                with open(self.save_dir / "summary.txt", "w", encoding="utf8") as f:
                    json.dump(self.counters.as_dict(), f, indent=1)
                if self.missing_files_list:
                    with open(
                        self.save_dir / "missing_files.txt", "w", encoding="utf8"
                    ) as f:
                        f.write("\n".join(self.missing_files_list))
                if self.multichannel_files_list:
                    # Parity: the reference's multichannel_files.txt report
                    # (everyvoice/preprocessor/preprocessor.py:1120-1152).
                    with open(
                        self.save_dir / "multichannel_files.txt", "w",
                        encoding="utf8",
                    ) as f:
                        f.write(
                            "Multichannel audio files skipped "
                            f"({len(self.multichannel_files_list)} total):\n"
                        )
                        f.write("\n".join(self.multichannel_files_list))
                        f.write("\n")
                if not filelist:
                    raise RuntimeError(
                        "Your filtered audio filelist is empty; nothing to process."
                    )
                write_filelist(filelist, processed_filelist)
            elif process in ("text", "pfs"):
                filelist = self.load_filelist(processed_filelist)
                assert self.text_processor is not None
                from collections import Counter

                before = Counter(self.text_processor.missing_symbols)
                for i, item in enumerate(filelist):
                    characters, phones, pfs = self.process_text(
                        item, use_pfs=(process == "pfs")
                    )
                    if characters is not None:
                        filelist[i]["character_tokens"] = characters
                    if phones is not None:
                        filelist[i]["phone_tokens"] = phones
                    if pfs is not None:
                        np.save(
                            self.create_path(
                                self.get_speaker_and_language(item), "pfs", "pfs.npy"
                            ),
                            pfs,
                            allow_pickle=False,
                        )
                write_filelist(filelist, processed_filelist)
                new_missing = self.text_processor.missing_symbols - before
                for symbol, count in new_missing.items():
                    logger.warning(
                        f"Symbol '{symbol}' occurs {n_times(count)} but was not "
                        "declared in your configuration so it is being ignored."
                    )
            elif process == "attn":
                filelist = self.load_filelist(processed_filelist)
                for item in filelist:
                    self.process_attn_prior(item)
            elif process in ("spec", "energy", "pitch"):
                # One batched pass computes all three; run it only once.
                wanted = tuple(
                    p for p in ("spec", "energy", "pitch") if p in to_process
                )
                if process != wanted[0]:
                    continue
                for w in wanted:
                    (self.save_dir / w).mkdir(parents=True, exist_ok=True)
                filelist = self.load_filelist(processed_filelist)
                self.process_features_batched(filelist, want=wanted)
            step_seconds[process] = round(_time.perf_counter() - _t0, 2)

        # stats + normalization. Normalization must be idempotent across
        # re-runs: artifacts on disk are already z-scored once stats.json
        # records their stats, so re-reading them would yield degenerate
        # mean≈0/std≈1 stats and double-normalize every file, permanently
        # losing the true corpus statistics.
        if "energy" in to_process or "pitch" in to_process:
            stats_path = self.save_dir / "stats.json"
            existing = (
                json.loads(stats_path.read_text(encoding="utf8"))
                if stats_path.exists()
                else {}
            )
            changed = False
            for kind in ("energy", "pitch"):
                if kind not in to_process:
                    continue
                prior = existing.get(kind)
                new_files = self._features_written.get(kind, [])
                if prior is not None and not self.overwrite:
                    # Incremental run: only the newly written files are
                    # raw — normalize them with the recorded stats so the
                    # whole corpus stays on one scale; existing stats are
                    # authoritative.
                    std = prior.get("std") or 1.0
                    mean = prior.get("mean", 0.0)
                    for path in new_files:
                        np.save(path, (np.load(path) - mean) / std)
                    if new_files:
                        logger.info(
                            f"Normalized {len(new_files)} new {kind} files "
                            "with the existing corpus stats."
                        )
                    continue
                scaler = Scaler()
                paths = sorted((self.save_dir / kind).glob(f"*{kind}*"))
                for path in paths:
                    scaler.append(np.load(path))
                if not len(scaler):
                    continue
                existing[kind] = scaler.calculate_stats()
                for path in paths:
                    np.save(path, scaler.normalize(np.load(path)))
                changed = True
            if changed or not stats_path.exists():
                stats_path.write_text(
                    json.dumps(existing, indent=1), encoding="utf8"
                )

        # split
        filelist = self.load_filelist(processed_filelist)
        random.shuffle(filelist)
        train_split = int(len(filelist) * self.preprocessing_config.train_split)
        name = Path(output_path).name
        write_filelist(filelist[:train_split], self.save_dir / f"training_{name}")
        write_filelist(filelist[train_split:], self.save_dir / f"validation_{name}")
        self.save_config_lock(in_progress=False)
        self.last_step_seconds = step_seconds  # introspection (benchmarks)
        timing = ", ".join(f"{k} {v}s" for k, v in step_seconds.items())
        logger.info(
            f"Finished preprocessing: {', '.join(to_process)} ({timing}). "
            f"Files are at {self.save_dir.absolute()}."
        )

    # ------------------------------------------------------------------
    # OOD text for StyleTTS2 SLM-adversarial training
    # (reference preprocessor.py:1242-1321)

    def preprocess_ood(self, ood_texts_by_lang: dict) -> None:
        ood_dir = self.save_dir / "ood"
        ood_dir.mkdir(parents=True, exist_ok=True)
        for lang, lines in ood_texts_by_lang.items():
            rows = [{"text": line} for line in lines if line.strip()]
            write_filelist(rows, ood_dir / f"{lang}.psv")

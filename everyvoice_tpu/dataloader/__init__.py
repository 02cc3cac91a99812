"""Host-side data pipeline feeding padded, static-shape numpy batches to the
jitted training steps (parity: everyvoice/dataloader/__init__.py +
imbalanced_sampler.py, re-designed for XLA's static-shape model: every batch
of an epoch has identical shapes, so one compilation serves the whole run).
"""

from __future__ import annotations

import math
import os
from pathlib import Path
from typing import Iterator, Optional, Sequence

import numpy as np

from everyvoice_tpu.config.type_definitions import TargetTrainingTextRepresentationLevel
from everyvoice_tpu.logger import logger
from everyvoice_tpu.preprocessor.preprocessor import FILENAME_SEP
from everyvoice_tpu.text import TextProcessor
from everyvoice_tpu.text.lookups import lookuptables_from_data


_ITEM_POOL = None


def _parallel_load(load_fn, idxs: list) -> list:
    """Load a batch's items concurrently. The native wav/npy codecs release
    the GIL inside their C calls, so a shared thread pool overlaps file IO
    across the batch — the reference gets this from DataLoader worker
    processes (dataloader/__init__.py:80-94); threads avoid the fork and
    pickling cost."""
    global _ITEM_POOL
    if len(idxs) <= 1 or os.environ.get("EVERYVOICE_NO_NATIVE_IO"):
        return [load_fn(int(i)) for i in idxs]
    if _ITEM_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _ITEM_POOL = ThreadPoolExecutor(
            max_workers=min(os.cpu_count() or 4, 8),
            thread_name_prefix="evtpu-io",
        )
    return list(_ITEM_POOL.map(lambda i: load_fn(int(i)), idxs))


def _n_batches(n: int, batch_size: int, drop_last: bool) -> int:
    """Batches per epoch. Unlike torch's drop_last, a non-empty dataset
    smaller than one batch still yields a single (duplicate-padded) batch —
    otherwise every epoch is empty and training loops spin forever on
    tiny corpora (batch entries are duplicated, which only reweights the
    few items, exactly like the ragged-final-batch padding)."""
    if drop_last:
        return max(n // batch_size, 1 if n else 0)
    return math.ceil(n / batch_size)


def imbalanced_sample_weights(
    labels: Sequence[str],
) -> np.ndarray:
    """Inverse-label-frequency weights for oversampling under-represented
    speakers/languages (reference dataloader/imbalanced_sampler.py:14-68)."""
    labels = list(labels)
    counts: dict = {}
    for label in labels:
        counts[label] = counts.get(label, 0) + 1
    weights = np.asarray([1.0 / counts[label] for label in labels], np.float64)
    return weights / weights.sum()


class FastSpeech2Dataset:
    """Loads preprocessed artifacts for the feature-prediction model."""

    def __init__(
        self,
        filelist: list,
        config,
        lang2id: dict,
        speaker2id: dict,
        text_processor: Optional[TextProcessor] = None,
    ):
        self.config = config
        self.save_dir = Path(config.preprocessing.save_dir)
        self.audio_config = config.preprocessing.audio
        self.lang2id = lang2id
        self.speaker2id = speaker2id
        self.text_processor = text_processor or TextProcessor(config.text)
        self.level = config.model.target_text_representation_level
        self.learn_alignment = config.model.learn_alignment
        self.max_frames = config.model.max_length
        self.items = [it for it in filelist if self._usable(it)]
        if len(self.items) < len(filelist):
            logger.warning(
                f"Dropped {len(filelist) - len(self.items)} filelist rows with "
                "missing artifacts or tokens."
            )
        self.max_text_len = max(
            (len(self._token_ids(it)) for it in self.items), default=1
        )
        # In-memory item cache: artifacts are small (a few hundred KB per
        # utterance) and re-read every epoch otherwise.
        self._cache: dict = {}
        self.max_cache_items = 5000

    # -- helpers -------------------------------------------------------
    def _token_column(self) -> str:
        if self.level == TargetTrainingTextRepresentationLevel.characters:
            return "character_tokens"
        return "phone_tokens"

    def _token_ids(self, item: dict) -> list:
        cached = item.get("_token_ids")
        if cached is None:
            joined = item.get(self._token_column()) or ""
            cached = self.text_processor.encode_escaped_string_sequence(joined)
            item["_token_ids"] = cached
        return cached

    def _path(self, item: dict, folder: str, fn: str) -> Path:
        speaker = item.get("speaker") or "default"
        language = item.get("language") or "default"
        return (
            self.save_dir
            / folder
            / FILENAME_SEP.join([item["basename"], speaker, language, fn])
        )

    def _spec_name(self) -> str:
        spec_type = self.audio_config.spec_type
        if not isinstance(spec_type, str):
            spec_type = spec_type.value
        return f"spec-{self.audio_config.input_sampling_rate}-{spec_type}.npy"

    def _usable(self, item: dict) -> bool:
        if not item.get(self._token_column()):
            return False
        return self._path(item, "spec", self._spec_name()).exists()

    def __len__(self) -> int:
        return len(self.items)

    # -- item assembly --------------------------------------------------
    def load_item(self, idx: int) -> dict:
        cached = self._cache.get(idx)
        if cached is not None:
            return cached
        item = self.items[idx]
        ids = self._token_ids(item)
        spec = np.load(self._path(item, "spec", self._spec_name()))  # (M, T)
        mel = spec.T.astype(np.float32)  # (T, M)
        pitch = np.load(self._path(item, "pitch", "pitch.npy")).astype(np.float32)
        energy = np.load(self._path(item, "energy", "energy.npy")).astype(np.float32)
        out = {
            "basename": item["basename"],
            "text": np.asarray(ids, np.int32),
            "mel": mel,
            "pitch": pitch,
            "energy": energy,
            "speaker_id": self.speaker2id.get(item.get("speaker") or "default", 0),
            "language_id": self.lang2id.get(item.get("language") or "default", 0),
        }
        if self.learn_alignment:
            rep = (
                "characters"
                if self.level == TargetTrainingTextRepresentationLevel.characters
                else "phones"
            )
            prior_path = self._path(item, "attn", f"{rep}-attn-prior.npy")
            if prior_path.exists():
                out["attn_prior"] = np.load(prior_path).astype(np.float32)
        else:
            dur_path = self._path(item, "duration", "duration.npy")
            if dur_path.exists():
                out["durations"] = np.load(dur_path).astype(np.int32)
        if len(self._cache) < self.max_cache_items:
            self._cache[idx] = out
        return out

    # -- batching -------------------------------------------------------
    def pad_batch(self, items: list, max_text: int, max_frames: int) -> dict:
        b = len(items)
        batch = {
            "text": np.zeros((b, max_text), np.int32),
            "text_lengths": np.zeros((b,), np.int32),
            "mel": np.zeros((b, max_frames, items[0]["mel"].shape[1]), np.float32),
            "mel_lengths": np.zeros((b,), np.int32),
            "pitch": np.zeros((b, max_frames), np.float32),
            "energy": np.zeros((b, max_frames), np.float32),
            "speaker_id": np.zeros((b,), np.int32),
            "language_id": np.zeros((b,), np.int32),
            "basenames": [it["basename"] for it in items],
        }
        if self.learn_alignment:
            batch["attn_prior"] = np.zeros((b, max_frames, max_text), np.float32)
        else:
            batch["durations"] = np.zeros((b, max_text), np.int32)
        for i, it in enumerate(items):
            n = min(len(it["text"]), max_text)
            t = min(it["mel"].shape[0], max_frames)
            batch["text"][i, :n] = it["text"][:n]
            batch["text_lengths"][i] = n
            batch["mel"][i, :t] = it["mel"][:t]
            batch["mel_lengths"][i] = t
            batch["pitch"][i, :t] = it["pitch"][:t]
            batch["energy"][i, :t] = it["energy"][:t]
            batch["speaker_id"][i] = it["speaker_id"]
            batch["language_id"][i] = it["language_id"]
            if self.learn_alignment and "attn_prior" in it:
                batch["attn_prior"][i, :t, :n] = it["attn_prior"][:t, :n]
            elif not self.learn_alignment and "durations" in it:
                d = it["durations"][:n]
                batch["durations"][i, : len(d)] = d
        return batch

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        weights: Optional[np.ndarray] = None,
    ) -> Iterator[dict]:
        """Yield padded batches; every batch of an epoch has the same static
        shape so XLA compiles the train step exactly once."""
        n = len(self.items)
        rng = np.random.default_rng(seed)
        if weights is not None:
            order = rng.choice(n, size=n, replace=True, p=weights)
        elif shuffle:
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        max_text = self.max_text_len
        # The model's frame axis is static (config.model.max_length), so pad
        # every batch to it — one compilation serves the entire run.
        max_frames = self.max_frames
        n_batches = _n_batches(n, batch_size, drop_last)
        use_native = self._native_io()
        for bi in range(n_batches):
            idxs = order[bi * batch_size : (bi + 1) * batch_size]
            # Re-check mid-epoch: a dtype fallback inside _native_batch sets
            # _native_failed, and retrying the native read every remaining
            # batch would double the epoch's file IO (and repeat the warning).
            if use_native and getattr(self, "_native_failed", False):
                use_native = False
            if use_native:
                yield self._native_batch(
                    [int(i) for i in idxs], batch_size, max_text, max_frames
                )
                continue
            items = _parallel_load(self.load_item, list(idxs))
            while len(items) < batch_size:  # pad the ragged final batch
                items.append(items[-1])
            yield self.pad_batch(items, max_text, max_frames)

    def _native_io(self) -> bool:
        """Use the C thread-pool npy loader for corpora too large for the
        in-memory item cache; small corpora go through load_item so epochs
        after the first serve from memory (the native path bypasses — and
        would otherwise never fill — the cache)."""
        if os.environ.get("EVERYVOICE_NO_NATIVE_IO"):
            return False
        if getattr(self, "_native_failed", False):
            return False
        if len(self.items) <= self.max_cache_items:
            return False
        from everyvoice_tpu.native import npy

        return npy.available()

    def _native_batch(self, idxs: list, batch_size: int, max_text: int,
                      max_frames: int) -> dict:
        """Assemble one padded batch with a single GIL-free parallel read of
        every artifact file straight into the batch arrays (no per-item
        intermediates) — the role the reference's DataLoader worker
        processes play, without pickling or forking."""
        from everyvoice_tpu.native import npy

        while len(idxs) < batch_size:  # pad the ragged final batch
            idxs.append(idxs[-1])
        b = len(idxs)
        n_mels = self.audio_config.n_mels
        batch = {
            "text": np.zeros((b, max_text), np.int32),
            "text_lengths": np.zeros((b,), np.int32),
            "mel": np.zeros((b, max_frames, n_mels), np.float32),
            "mel_lengths": np.zeros((b,), np.int32),
            "pitch": np.zeros((b, max_frames), np.float32),
            "energy": np.zeros((b, max_frames), np.float32),
            "speaker_id": np.zeros((b,), np.int32),
            "language_id": np.zeros((b,), np.int32),
            "basenames": [],
        }
        if self.learn_alignment:
            batch["attn_prior"] = np.zeros(
                (b, max_frames, max_text), np.float32
            )
            rep = (
                "characters"
                if self.level == TargetTrainingTextRepresentationLevel.characters
                else "phones"
            )
        else:
            batch["durations"] = np.zeros((b, max_text), np.int32)
        tasks = []
        mel_task_idx = []
        for i, idx in enumerate(idxs):
            item = self.items[idx]
            batch["basenames"].append(item["basename"])
            ids = self._token_ids(item)
            n = min(len(ids), max_text)
            batch["text"][i, :n] = np.asarray(ids[:n], np.int32)
            batch["text_lengths"][i] = n
            batch["speaker_id"][i] = self.speaker2id.get(
                item.get("speaker") or "default", 0
            )
            batch["language_id"][i] = self.lang2id.get(
                item.get("language") or "default", 0
            )
            mel_task_idx.append(len(tasks))
            tasks.append(
                (self._path(item, "spec", self._spec_name()), batch["mel"][i],
                 True)
            )
            tasks.append(
                (self._path(item, "pitch", "pitch.npy"),
                 batch["pitch"][i : i + 1], False)
            )
            tasks.append(
                (self._path(item, "energy", "energy.npy"),
                 batch["energy"][i : i + 1], False)
            )
            if self.learn_alignment:
                prior = self._path(item, "attn", f"{rep}-attn-prior.npy")
                if prior.exists():
                    tasks.append((prior, batch["attn_prior"][i], False))
            else:
                dur = self._path(item, "duration", "duration.npy")
                if dur.exists():
                    tasks.append((dur, batch["durations"][i : i + 1], False))
        rows = npy.read_npy_many(tasks)
        for task_index, row_count in enumerate(rows):
            if row_count == -2:
                # Unexpected artifact dtype (e.g. externally produced i8/f8
                # durations): permanently fall back to the np.load path,
                # which coerces dtypes — never bit-reinterpret.
                logger.warning(
                    f"{tasks[task_index][0]} has a dtype the native loader "
                    "does not handle; using the numpy loader from now on."
                )
                self._native_failed = True
                items = _parallel_load(self.load_item, idxs)
                return self.pad_batch(items, max_text, max_frames)
            if row_count < 0:
                # Missing/corrupt file: an error, matching np.load's
                # behavior — silently-zero targets would poison training.
                raise OSError(f"Failed to read {tasks[task_index][0]}")
        for i, task_index in enumerate(mel_task_idx):
            batch["mel_lengths"][i] = rows[task_index]
        return batch


def it_mel_frames(dataset: FastSpeech2Dataset, idx: int) -> int:
    item = dataset.items[idx]
    path = dataset._path(item, "spec", dataset._spec_name())
    return int(np.load(path, mmap_mode="r").shape[1])


class HiFiGANDataset:
    """Loads (mel, waveform) pairs for vocoder training. Random fixed-size
    segment sampling happens on device inside the train step, so items are
    padded to the epoch's max length here."""

    def __init__(self, filelist: list, config, finetune: bool = False):
        self.config = config
        self.save_dir = Path(config.preprocessing.save_dir)
        self.audio_config = config.preprocessing.audio
        self.finetune = finetune
        self.output_sr = self.audio_config.output_sampling_rate
        self.input_sr = self.audio_config.input_sampling_rate
        self.items = [it for it in filelist if self._usable(it)]
        self._cache: dict = {}
        self.max_cache_items = 2000

    def _path(self, item: dict, folder: str, fn: str) -> Path:
        speaker = item.get("speaker") or "default"
        language = item.get("language") or "default"
        return (
            self.save_dir
            / folder
            / FILENAME_SEP.join([item["basename"], speaker, language, fn])
        )

    def _spec_name(self) -> str:
        spec_type = self.audio_config.spec_type
        if not isinstance(spec_type, str):
            spec_type = spec_type.value
        return f"spec-{self.input_sr}-{spec_type}.npy"

    def _spec_folder(self) -> str:
        return "synthesized_spec" if self.finetune else "spec"

    def _usable(self, item: dict) -> bool:
        return (
            self._path(item, self._spec_folder(), self._spec_name()).exists()
            and self._path(item, "audio", f"audio-{self.output_sr}.wav").exists()
        )

    def __len__(self) -> int:
        return len(self.items)

    def load_item(self, idx: int) -> dict:
        cached = self._cache.get(idx)
        if cached is not None:
            return cached
        from everyvoice_tpu.dsp import read_wav

        item = self.items[idx]
        spec = np.load(self._path(item, self._spec_folder(), self._spec_name()))
        audio, _ = read_wav(self._path(item, "audio", f"audio-{self.output_sr}.wav"))
        out = {
            "basename": item["basename"],
            "mel": spec.T.astype(np.float32),  # (T, M)
            "audio": audio[0].astype(np.float32),
        }
        if len(self._cache) < self.max_cache_items:
            self._cache[idx] = out
        return out

    def batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0,
        drop_last: bool = False,
    ) -> Iterator[dict]:
        n = len(self.items)
        rng = np.random.default_rng(seed)
        order = rng.permutation(n) if shuffle else np.arange(n)
        hop = self.audio_config.fft_hop_size
        max_frames = 0
        for i in range(n):
            spec = np.load(
                self._path(self.items[i], self._spec_folder(), self._spec_name()),
                mmap_mode="r",
            )
            max_frames = max(max_frames, spec.shape[1])
        max_samples = max_frames * hop * (self.output_sr // self.input_sr)
        n_batches = _n_batches(n, batch_size, drop_last)
        for bi in range(n_batches):
            idxs = order[bi * batch_size : (bi + 1) * batch_size]
            items = _parallel_load(self.load_item, list(idxs))
            while len(items) < batch_size:
                items.append(items[-1])
            b = len(items)
            batch = {
                "mel": np.zeros((b, max_frames, items[0]["mel"].shape[1]), np.float32),
                "mel_lengths": np.zeros((b,), np.int32),
                "audio": np.zeros((b, max_samples), np.float32),
                "audio_lengths": np.zeros((b,), np.int32),
                "basenames": [it["basename"] for it in items],
            }
            for i, it in enumerate(items):
                t = min(it["mel"].shape[0], max_frames)
                s = min(len(it["audio"]), max_samples)
                batch["mel"][i, :t] = it["mel"][:t]
                batch["mel_lengths"][i] = t
                batch["audio"][i, :s] = it["audio"][:s]
                batch["audio_lengths"][i] = s
            yield batch

    def segment_batches(
        self, batch_size: int, segment_size: int, shuffle: bool = True,
        seed: int = 0, drop_last: bool = False,
    ) -> Iterator[dict]:
        """Random fixed-size (mel, audio) segment per item, sampled on the
        host (the reference samples segments in its dataloader too,
        utils/heavy.py:122-148). Ships only segment-sized tensors to the
        device — ~20x less host->device transfer than whole-utterance
        batches when utterances are ~11 s and segments 8192 samples."""
        n = len(self.items)
        rng = np.random.default_rng(seed)
        order = rng.permutation(n) if shuffle else np.arange(n)
        hop = self.audio_config.fft_hop_size * (self.output_sr // self.input_sr)
        seg_frames = segment_size // hop
        n_batches = _n_batches(n, batch_size, drop_last)
        for bi in range(n_batches):
            idxs = order[bi * batch_size : (bi + 1) * batch_size]
            items = _parallel_load(self.load_item, list(idxs))
            while len(items) < batch_size:
                items.append(items[-1])
            b = len(items)
            n_mels = items[0]["mel"].shape[1]
            batch = {
                "mel": np.zeros((b, seg_frames, n_mels), np.float32),
                "audio": np.zeros((b, segment_size), np.float32),
                "basenames": [it["basename"] for it in items],
            }
            for i, it in enumerate(items):
                frames = it["mel"].shape[0]
                max_start = max(frames - seg_frames, 0)
                start = int(rng.integers(0, max_start + 1)) if shuffle else 0
                mel = it["mel"][start : start + seg_frames]
                batch["mel"][i, : mel.shape[0]] = mel
                audio = it["audio"][start * hop : start * hop + segment_size]
                batch["audio"][i, : len(audio)] = audio
            yield batch


def build_lookups_from_config(config) -> tuple:
    train = config.training.filelist_loader(config.training.training_filelist)
    val = config.training.filelist_loader(config.training.validation_filelist)
    return lookuptables_from_data((train, val)), (train, val)


class StyleTTS2Dataset:
    """Batches for StyleTTS2 training: text ids, mel (style ref + recon
    target), frame-aligned F0/energy (+ token-averaged versions), durations,
    and raw audio. Durations come from `duration/` artifacts when present
    (aligner output), else frames are distributed uniformly over tokens — a
    documented fallback for training without the pretrained ASR aligner."""

    def __init__(self, filelist: list, config, text_processor=None):
        from everyvoice_tpu.text import TextProcessor

        self.config = config
        self.save_dir = Path(config.preprocessing.save_dir)
        self.audio_config = config.preprocessing.audio
        self.text_processor = text_processor or TextProcessor(config.text)
        self.n_symbols = len(self.text_processor.symbols)
        self.max_frames = config.training.max_len
        self.level = config.model.target_text_representation_level
        self.input_sr = self.audio_config.input_sampling_rate
        self.output_sr = self.audio_config.output_sampling_rate
        self.items = [it for it in filelist if self._usable(it)]
        self.max_text_len = max(
            (len(self._token_ids(it)) for it in self.items), default=1
        )

    def _token_column(self) -> str:
        return (
            "character_tokens"
            if self.level.value == "characters"
            else "phone_tokens"
        )

    def _token_ids(self, item: dict) -> list:
        cached = item.get("_token_ids")
        if cached is None:
            joined = item.get(self._token_column()) or ""
            cached = self.text_processor.encode_escaped_string_sequence(joined)
            item["_token_ids"] = cached
        return cached

    def _path(self, item: dict, folder: str, fn: str) -> Path:
        speaker = item.get("speaker") or "default"
        language = item.get("language") or "default"
        return (
            self.save_dir
            / folder
            / FILENAME_SEP.join([item["basename"], speaker, language, fn])
        )

    def _spec_name(self) -> str:
        spec_type = self.audio_config.spec_type
        if not isinstance(spec_type, str):
            spec_type = spec_type.value
        return f"spec-{self.input_sr}-{spec_type}.npy"

    def _usable(self, item: dict) -> bool:
        return (
            bool(item.get(self._token_column()))
            and self._path(item, "spec", self._spec_name()).exists()
            and self._path(item, "pitch", "pitch.npy").exists()
            and self._path(item, "audio", f"audio-{self.output_sr}.wav").exists()
        )

    def __len__(self) -> int:
        return len(self.items)

    def load_item(self, idx: int) -> dict:
        from everyvoice_tpu.dsp import read_wav

        item = self.items[idx]
        ids = np.asarray(self._token_ids(item), np.int32)
        mel = np.load(self._path(item, "spec", self._spec_name())).T
        pitch = np.load(self._path(item, "pitch", "pitch.npy"))
        energy = np.load(self._path(item, "energy", "energy.npy"))
        audio, _ = read_wav(
            self._path(item, "audio", f"audio-{self.output_sr}.wav")
        )
        n_frames = mel.shape[0]
        dur_path = self._path(item, "duration", "duration.npy")
        if dur_path.exists():
            durations = np.load(dur_path).astype(np.int32)[: len(ids)]
        else:
            if not getattr(self, "_warned_uniform_durations", False):
                self._warned_uniform_durations = True
                from everyvoice_tpu.logger import logger

                logger.warning(
                    "No duration/ artifacts found — falling back to uniform "
                    "durations for StyleTTS2 stage-1 bootstrapping. These "
                    "are wrong alignments; the trainer's TMA aligner takes "
                    "over at tma_epoch, or provide durations from the CTC "
                    "segmenter / a trained FastSpeech2 alignment."
                )
            base = n_frames // max(len(ids), 1)
            durations = np.full(len(ids), base, np.int32)
            durations[-1] += n_frames - durations.sum()
        return {
            "basename": item["basename"],
            "text": ids,
            "mel": mel.astype(np.float32),
            "pitch": pitch.astype(np.float32),
            "energy": energy.astype(np.float32),
            "audio": audio[0].astype(np.float32),
            "durations": durations,
        }

    @staticmethod
    def _token_average(frame_values, durations):
        out = np.zeros(len(durations), np.float32)
        pos = 0
        for i, d in enumerate(durations):
            if d > 0 and pos < len(frame_values):
                out[i] = float(np.mean(frame_values[pos : pos + d]))
            pos += d
        return out

    def batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0,
        drop_last: bool = False,
    ) -> Iterator[dict]:
        n = len(self.items)
        rng = np.random.default_rng(seed)
        order = rng.permutation(n) if shuffle else np.arange(n)
        max_text = self.max_text_len
        max_frames = self.max_frames
        hop = self.audio_config.fft_hop_size * (self.output_sr // self.input_sr)
        max_samples = max_frames * hop
        n_batches = _n_batches(n, batch_size, drop_last)
        for bi in range(n_batches):
            idxs = order[bi * batch_size : (bi + 1) * batch_size]
            items = _parallel_load(self.load_item, list(idxs))
            while len(items) < batch_size:
                items.append(items[-1])
            b = len(items)
            n_mels = items[0]["mel"].shape[1]
            batch = {
                "text": np.zeros((b, max_text), np.int32),
                "text_lengths": np.zeros((b,), np.int32),
                "mel": np.zeros((b, max_frames, n_mels), np.float32),
                "mel_lengths": np.zeros((b,), np.int32),
                "f0_frames": np.zeros((b, max_frames), np.float32),
                "energy_frames": np.zeros((b, max_frames), np.float32),
                "f0_tokens": np.zeros((b, max_text), np.float32),
                "energy_tokens": np.zeros((b, max_text), np.float32),
                "durations": np.zeros((b, max_text), np.int32),
                "audio": np.zeros((b, max_samples), np.float32),
                "basenames": [it["basename"] for it in items],
            }
            for i, it in enumerate(items):
                ntok = min(len(it["text"]), max_text)
                t = min(it["mel"].shape[0], max_frames)
                s = min(len(it["audio"]), max_samples)
                batch["text"][i, :ntok] = it["text"][:ntok]
                batch["text_lengths"][i] = ntok
                batch["mel"][i, :t] = it["mel"][:t]
                batch["mel_lengths"][i] = t
                batch["f0_frames"][i, :t] = it["pitch"][:t]
                batch["energy_frames"][i, :t] = it["energy"][:t]
                dur = it["durations"][:ntok].copy()
                # Clip durations so their sum fits the frame budget.
                overflow = max(int(dur.sum()) - t, 0)
                while overflow > 0 and dur.max() > 1:
                    j = int(np.argmax(dur))
                    take = min(overflow, int(dur[j]) - 1)
                    dur[j] -= take
                    overflow -= take
                batch["durations"][i, :ntok] = dur
                batch["f0_tokens"][i, :ntok] = self._token_average(
                    it["pitch"][:t], dur
                )
                batch["energy_tokens"][i, :ntok] = self._token_average(
                    it["energy"][:t], dur
                )
                batch["audio"][i, :s] = it["audio"][:s]
            yield batch

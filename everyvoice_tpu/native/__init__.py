"""Native (C) runtime components, loaded through ctypes.

The WAV codec compiles on first import with the system C compiler into a
per-user cache; every entry point releases the GIL, so host thread pools
decode audio in parallel with TPU compute. Import failures (no compiler,
sandboxed filesystem) degrade gracefully — callers fall back to the pure
numpy implementations in everyvoice_tpu.dsp.audio_io.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

_SOURCE = Path(__file__).parent / "wav_io.c"


def build_shared_library(source: Path, extra_flags: tuple = ()) -> ctypes.CDLL:
    """Compile a C source into a content-addressed cached .so and load it."""
    text = Path(source).read_text(encoding="utf8")
    digest = hashlib.sha256(text.encode()).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")
    ) / "everyvoice_tpu"
    cache_dir.mkdir(parents=True, exist_ok=True)
    lib_path = cache_dir / f"{Path(source).stem}-{digest}.so"
    if not lib_path.exists():
        compiler = os.environ.get("CC", "cc")
        tmp_path = lib_path.with_suffix(f".tmp{os.getpid()}.so")
        result = subprocess.run(
            [compiler, "-O3", "-shared", "-fPIC", "-o", str(tmp_path),
             str(source), *extra_flags],
            capture_output=True, text=True,
        )
        if result.returncode != 0:
            raise RuntimeError(f"C compilation failed: {result.stderr}")
        tmp_path.replace(lib_path)
    return ctypes.CDLL(str(lib_path))


def _build_library() -> Optional[ctypes.CDLL]:
    lib = build_shared_library(_SOURCE)
    lib.wav_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.wav_info.restype = ctypes.c_int
    lib.wav_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
    ]
    lib.wav_read_f32.restype = ctypes.c_long
    lib.wav_write_i16.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.wav_write_i16.restype = ctypes.c_int
    return lib


try:
    _lib = _build_library()
except Exception:  # pragma: no cover - environment without a C compiler
    _lib = None


def available() -> bool:
    return _lib is not None


def wav_info(path) -> tuple:
    """(channels, sample_rate, bits, format_code, n_frames)"""
    assert _lib is not None
    channels = ctypes.c_int()
    sr = ctypes.c_int()
    bits = ctypes.c_int()
    fmt = ctypes.c_int()
    frames = ctypes.c_long()
    rc = _lib.wav_info(
        str(path).encode(), ctypes.byref(channels), ctypes.byref(sr),
        ctypes.byref(bits), ctypes.byref(fmt), ctypes.byref(frames),
    )
    if rc != 0:
        raise OSError(f"wav_info({path}) failed with code {rc}")
    return channels.value, sr.value, bits.value, fmt.value, frames.value


def read_wav_native(path):
    """(audio float32 (channels, samples), sample_rate) via the C codec."""
    import numpy as np

    assert _lib is not None
    channels, sr, bits, fmt, frames = wav_info(path)
    total = frames * channels
    out = np.empty(total, dtype=np.float32)
    n = _lib.wav_read_f32(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        total,
    )
    if n < 0:
        raise OSError(f"wav_read_f32({path}) failed with code {n}")
    audio = out[:n]
    if channels > 1:
        audio = audio.reshape(-1, channels).T
    else:
        audio = audio.reshape(1, -1)
    return np.ascontiguousarray(audio), sr


def write_wav_native(path, audio, sample_rate: int) -> None:
    """Write float32 (channels, samples) or (samples,) as 16-bit PCM."""
    import numpy as np

    assert _lib is not None
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    channels = audio.shape[0]
    interleaved = np.ascontiguousarray(audio.T.reshape(-1))
    rc = _lib.wav_write_i16(
        str(path).encode(),
        interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        interleaved.size, channels, sample_rate,
    )
    if rc != 0:
        raise OSError(f"wav_write_i16({path}) failed with code {rc}")

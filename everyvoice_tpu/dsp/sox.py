"""Implementations of the supported sox-style audio effects.

The reference shells out to the sox binary per file
(everyvoice/preprocessor/helpers.py:137-187); here the supported effect
specs are applied as array ops — jax arrays fuse into batched device
graphs, numpy arrays run the same math on host for the one-file-at-a-time
preprocessing path. Effect specs keep the sox CLI-compatible
list-of-lists format (e.g. ``[["channels", "1"], ["gain", "-3"]]``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from everyvoice_tpu.dsp.resample import resample, resample_host

SUPPORTED_EFFECTS = (
    "channels", "rate", "gain", "norm", "vol", "remix", "trim", "reverse",
)


class UnsupportedSoxEffect(ValueError):
    pass


def apply_sox_effects(
    audio, sample_rate: int, effects: Sequence[Sequence]
) -> tuple:
    """Apply a chain of effect specs to (channels, samples) audio.

    Returns (audio, sample_rate) since ``rate`` changes the latter.

    Works on either a numpy array (host path: one file at a time during
    preprocessing, where per-unique-length device dispatch would trigger an
    XLA compile per file) or a jax array (device path: fused into batched
    graphs). The output stays in the input's namespace."""
    if isinstance(audio, np.ndarray):
        xp, do_resample = np, resample_host
    else:
        import jax.numpy as xp  # noqa: F811

        do_resample = resample
    for effect in effects or ():
        if not effect:
            continue
        name, *args = [str(a) for a in effect]
        if name == "channels":
            n = int(args[0])
            if n == 1 and audio.shape[0] > 1:
                audio = xp.mean(audio, axis=0, keepdims=True)
            elif n > 1 and audio.shape[0] == 1:
                audio = xp.tile(audio, (n, 1))
            elif n != audio.shape[0]:
                raise UnsupportedSoxEffect(
                    f"channels {audio.shape[0]}→{n} is not supported"
                )
        elif name == "remix":
            chans = [int(a) - 1 for a in args]
            audio = audio[xp.asarray(chans)]
        elif name == "rate":
            new_sr = int(float(args[-1]))
            audio = do_resample(audio, sample_rate, new_sr)
            sample_rate = new_sr
        elif name == "gain":
            db = float(args[-1])
            audio = audio * (10.0 ** (db / 20.0))
        elif name in ("norm", "vol"):
            if name == "norm":
                target_db = float(args[0]) if args else 0.0
                peak = xp.max(xp.abs(audio))
                audio = audio * (10.0 ** (target_db / 20.0) / xp.maximum(peak, 1e-9))
            else:
                audio = audio * float(args[0])
        elif name == "trim":
            start_s = float(args[0])
            start = int(start_s * sample_rate)
            if len(args) > 1:
                dur = int(float(args[1]) * sample_rate)
                audio = audio[:, start : start + dur]
            else:
                audio = audio[:, start:]
        elif name == "reverse":
            audio = audio[:, ::-1]
        else:
            raise UnsupportedSoxEffect(
                f"sox effect '{name}' is not implemented on-device; "
                f"supported: {SUPPORTED_EFFECTS}"
            )
    return audio, sample_rate

"""On-device implementations of the supported sox-style audio effects.

The reference shells out to the sox binary per file
(everyvoice/preprocessor/helpers.py:137-187); here the supported effect
specs are applied as jax ops so they fuse into the batched preprocessing
graph. Effect specs keep the sox CLI-compatible list-of-lists format
(e.g. ``[["channels", "1"], ["gain", "-3"]]``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from everyvoice_tpu.dsp.resample import resample

SUPPORTED_EFFECTS = (
    "channels", "rate", "gain", "norm", "vol", "remix", "trim", "reverse",
)


class UnsupportedSoxEffect(ValueError):
    pass


def apply_sox_effects(
    audio: jnp.ndarray, sample_rate: int, effects: Sequence[Sequence]
) -> tuple:
    """Apply a chain of effect specs to (channels, samples) audio.

    Returns (audio, sample_rate) since ``rate`` changes the latter."""
    for effect in effects or ():
        if not effect:
            continue
        name, *args = [str(a) for a in effect]
        if name == "channels":
            n = int(args[0])
            if n == 1 and audio.shape[0] > 1:
                audio = jnp.mean(audio, axis=0, keepdims=True)
            elif n > 1 and audio.shape[0] == 1:
                audio = jnp.tile(audio, (n, 1))
            elif n != audio.shape[0]:
                raise UnsupportedSoxEffect(
                    f"channels {audio.shape[0]}→{n} is not supported"
                )
        elif name == "remix":
            chans = [int(a) - 1 for a in args]
            audio = audio[jnp.asarray(chans)]
        elif name == "rate":
            new_sr = int(float(args[-1]))
            audio = resample(audio, sample_rate, new_sr)
            sample_rate = new_sr
        elif name == "gain":
            db = float(args[-1])
            audio = audio * (10.0 ** (db / 20.0))
        elif name in ("norm", "vol"):
            if name == "norm":
                target_db = float(args[0]) if args else 0.0
                peak = jnp.max(jnp.abs(audio))
                audio = audio * (10.0 ** (target_db / 20.0) / jnp.maximum(peak, 1e-9))
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

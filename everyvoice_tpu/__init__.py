"""everyvoice_tpu — a TPU-native (JAX/XLA/Pallas) text-to-speech framework.

A from-scratch rebuild of the EveryVoice TTS toolkit's capabilities
(reference: EveryVoiceTTS/EveryVoice v0.5.0) designed TPU-first:

- batched on-device DSP (STFT/mel, pitch, energy, loudness, resampling)
  instead of per-file CPU passes,
- flax models (FastSpeech2-style feature prediction, HiFiGAN/iSTFTNet
  vocoders) compiled with jit/pjit over a ``jax.sharding.Mesh``,
- a functional training loop with optax + orbax-style checkpointing
  instead of PyTorch Lightning.

The user-facing contracts (CLI verbs, the five-config-file family, psv
filelists, preprocessed artifact layout, checkpoint-embedded
config/lookups/stats) match the reference so users can switch over.
"""

__version__ = "0.1.0"


def _default_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at a per-user directory so
    repeat runs skip XLA compiles (the full-size HiFiGAN GAN step takes
    minutes to compile; the second run loads it from disk in seconds).
    Opt out with EVERYVOICE_JAX_CACHE=off, or override with a path."""
    import os

    value = os.environ.get("EVERYVOICE_JAX_CACHE", "")
    if value.lower() in ("0", "off", "none"):
        return
    cache_dir = value or os.path.join(
        os.path.expanduser("~"), ".cache", "everyvoice_tpu", "jax_cache"
    )
    # Works whether or not jax is imported yet: the env var seeds the
    # config default, and if jax is already up we set it directly.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    import sys

    jax = sys.modules.get("jax")
    if jax is not None:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception:  # pragma: no cover - config name drift
            pass


_default_compilation_cache()

# Version of the on-disk config schema family we emit/consume; tracks the
# reference's `.schema/everyvoice-*-0.5.json` generation.
CONFIG_SCHEMA_VERSION = "0.5"

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

# Version of the on-disk config schema family we emit/consume; tracks the
# reference's `.schema/everyvoice-*-0.5.json` generation.
CONFIG_SCHEMA_VERSION = "0.5"

"""Real-but-untrained model checkpoints for CLI/demo tests
(model: reference everyvoice/tests/model_stubs.py:24-72)."""

from pathlib import Path

import jax
import jax.numpy as jnp

from everyvoice_tpu.config import PreprocessingConfig, TextConfig
from everyvoice_tpu.models.fs2 import FastSpeech2, FastSpeech2Config
from everyvoice_tpu.models.hifigan import HiFiGANConfig
from everyvoice_tpu.models.hifigan.model import (
    HiFiGANGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from everyvoice_tpu.text import TextProcessor
from everyvoice_tpu.train import save_checkpoint

CONTACT = {"contact_name": "Test Runner", "contact_email": "info@everyvoice.ca"}

SMALL_FS2_MODEL = {
    "encoder": {"layers": 1, "heads": 2, "input_dim": 64,
                "feedforward_dim": 128, "conv_kernel_size": 3},
    "decoder": {"layers": 1, "heads": 2, "input_dim": 64,
                "feedforward_dim": 128, "conv_kernel_size": 3},
    "variance_predictors": {
        "energy": {"n_layers": 1, "input_dim": 64},
        "duration": {"n_layers": 1, "input_dim": 64},
        "pitch": {"n_layers": 1, "input_dim": 64},
    },
    "max_length": 256,
}

SMALL_HIFIGAN_MODEL = {
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3]],
    "mpd_layers": [2],
    "msd_layers": 1,
}

STATS = {
    "pitch": {"mean": 200.0, "std": 50.0, "min": 80.0, "max": 400.0,
              "norm_min": -2.4, "norm_max": 4.0, "sample_size": 5},
    "energy": {"mean": 10.0, "std": 5.0, "min": 0.0, "max": 50.0,
               "norm_min": -2.0, "norm_max": 8.0, "sample_size": 5},
}


def make_fs2_config(tmp_path: Path) -> FastSpeech2Config:
    return FastSpeech2Config(
        contact=CONTACT,
        model=SMALL_FS2_MODEL,
        preprocessing=PreprocessingConfig(save_dir=tmp_path / "preprocessed"),
        text=TextConfig(symbols={"letters": list("abcdefghijklmnopqrstuvwxyz")}),
    )


def get_dummy_fs2_checkpoint(tmp_path: Path) -> Path:
    """Save a genuine (seeded, untrained) FastSpeech2 checkpoint."""
    config = make_fs2_config(tmp_path)
    tp = TextProcessor(config.text)
    model = FastSpeech2.from_config(config, n_symbols=len(tp.symbols))
    rng = jax.random.PRNGKey(42)
    text = jnp.zeros((1, 8), jnp.int32)
    params = model.init(
        {"params": rng, "dropout": rng}, text, jnp.asarray([8], jnp.int32)
    )
    path = tmp_path / "fs2.ckpt"
    save_checkpoint(
        path, "FastSpeech2", config, params,
        lang2id={"default": 0}, speaker2id={"default": 0}, stats=STATS,
    )
    return path


def get_dummy_hifigan_checkpoint(
    tmp_path: Path, generator_only: bool = False
) -> Path:
    config = HiFiGANConfig(
        contact=CONTACT,
        model=SMALL_HIFIGAN_MODEL,
        preprocessing=PreprocessingConfig(save_dir=tmp_path / "preprocessed"),
    )
    rng = jax.random.PRNGKey(42)
    gen = HiFiGANGenerator.from_config(config)
    gen_params = gen.init(rng, jnp.zeros((1, 16, 80)))
    path = tmp_path / ("hifigan_gen.ckpt" if generator_only else "hifigan.ckpt")
    if generator_only:
        save_checkpoint(path, "HiFiGANGenerator", config, gen_params)
    else:
        mpd = MultiPeriodDiscriminator(periods=(2,))
        msd = MultiScaleDiscriminator(n_scales=1)
        wav = jnp.zeros((1, 4096))
        save_checkpoint(
            path, "HiFiGAN", config,
            {
                "generator": gen_params,
                "discriminators": {
                    "mpd": mpd.init(rng, wav),
                    "msd": msd.init(rng, wav),
                },
            },
        )
    return path


def get_dummy_styletts2_checkpoint(tmp_path: Path) -> Path:
    from everyvoice_tpu.models.styletts2.config import StyleTTS2Config
    from everyvoice_tpu.models.styletts2.model import StyleTTS2Module

    config = StyleTTS2Config(
        contact=CONTACT,
        model={
            "hidden_dim": 64, "style_dim": 32, "max_dur": 20,
            "decoder": {"upsample_initial_channel": 32,
                        "resblock_kernel_sizes": [3],
                        "resblock_dilation_sizes": [[1, 3]],
                        "mpd_layers": [2], "msd_layers": 1},
            "diffusion": {"transformer": {"num_layers": 1, "num_heads": 2,
                                          "head_features": 16}},
        },
        preprocessing=PreprocessingConfig(save_dir=tmp_path / "preprocessed"),
        text=TextConfig(symbols={"letters": list("abcdefghijklmnopqrstuvwxyz")}),
    )
    config.training.max_len = 64
    from everyvoice_tpu.text import TextProcessor

    tp = TextProcessor(config.text)
    model = StyleTTS2Module.from_config(config, n_symbols=len(tp.symbols))
    rng = jax.random.PRNGKey(7)
    tokens = jnp.zeros((1, 8), jnp.int32)
    params = model.init(
        {"params": rng, "dropout": rng, "noise": rng},
        tokens, jnp.asarray([8], jnp.int32), jnp.zeros((1, 64, 80)),
        durations=jnp.full((1, 8), 4, jnp.int32),
        f0_frames=jnp.full((1, 64), 150.0),
        energy_frames=jnp.zeros((1, 64)),
    )
    path = tmp_path / "styletts2.ckpt"
    save_checkpoint(
        path, "StyleTTS2Module", config, {"generator": params},
        lang2id={"default": 0},
    )
    return path

"""Multi-speaker pipeline test over the LJ multispeaker fixture
(BASELINE config #4: multi-speaker/multilingual FastSpeech2)."""

from pathlib import Path

import numpy as np
import pytest

import jax

from everyvoice_tpu.config import PreprocessingConfig, TextConfig
from everyvoice_tpu.config.preprocessing_config import Dataset
from everyvoice_tpu.dataloader import (
    FastSpeech2Dataset,
    imbalanced_sample_weights,
)
from everyvoice_tpu.models.fs2 import FastSpeech2Config
from everyvoice_tpu.parallel import make_mesh
from everyvoice_tpu.preprocessor import Preprocessor
from everyvoice_tpu.text.lookups import lookuptables_from_data
from everyvoice_tpu.train import FastSpeech2Trainer, load_checkpoint_header
from everyvoice_tpu.utils import generic_psv_filelist_reader

LJ_DATA = Path("/root/reference/everyvoice/tests/data")
CONTACT = {"contact_name": "Test Runner", "contact_email": "info@everyvoice.ca"}

pytestmark = pytest.mark.skipif(
    not (LJ_DATA / "lj" / "wavs").exists(), reason="LJ fixture unavailable"
)


@pytest.fixture(scope="module")
def multispeaker_corpus(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("multi")
    config = FastSpeech2Config(
        contact=CONTACT,
        model={
            "multispeaker": True,
            "encoder": {"layers": 1, "input_dim": 64, "feedforward_dim": 128,
                        "conv_kernel_size": 3},
            "decoder": {"layers": 1, "input_dim": 64, "feedforward_dim": 128,
                        "conv_kernel_size": 3},
            "variance_predictors": {
                "energy": {"n_layers": 1, "input_dim": 64},
                "duration": {"n_layers": 1, "input_dim": 64},
                "pitch": {"n_layers": 1, "input_dim": 64},
            },
            "max_length": 768,
        },
        preprocessing=PreprocessingConfig(
            save_dir=tmp_path / "preprocessed",
            train_split=0.8,
            source_data=[
                Dataset(
                    label="LJ_MULTI",
                    permissions_obtained=True,
                    data_dir=LJ_DATA / "lj" / "wavs",
                    filelist=LJ_DATA / "metadata_different_speakers.psv",
                )
            ],
        ),
        text=TextConfig(symbols={"letters": list("abcdefghijklmnopqrstuvwxyz")}),
    )
    Preprocessor(config).preprocess(
        to_process=("audio", "text", "spec", "attn", "energy", "pitch"),
        overwrite=True,
    )
    save_dir = config.preprocessing.save_dir
    config.training.training_filelist = save_dir / "training_filelist.psv"
    config.training.validation_filelist = save_dir / "validation_filelist.psv"
    config.training.batch_size = 2
    return config, save_dir


@pytest.mark.slow
class TestMultiSpeaker:
    def test_speakers_preserved_through_pipeline(self, multispeaker_corpus):
        config, save_dir = multispeaker_corpus
        train = generic_psv_filelist_reader(config.training.training_filelist)
        val = generic_psv_filelist_reader(config.training.validation_filelist)
        speakers = {r["speaker"] for r in train + val}
        assert len(speakers) >= 2
        # Artifacts carry the speaker in their filename.
        assert list(Path(save_dir, "spec").glob("*--Speaker_1--*.npy"))

    def test_lookup_tables(self, multispeaker_corpus):
        config, _ = multispeaker_corpus
        train = generic_psv_filelist_reader(config.training.training_filelist)
        val = generic_psv_filelist_reader(config.training.validation_filelist)
        lang2id, speaker2id = lookuptables_from_data((train, val))
        assert len(speaker2id) >= 2
        assert sorted(speaker2id.values()) == list(range(len(speaker2id)))

    def test_weighted_sampler_balances(self):
        labels = ["a"] * 9 + ["b"]
        weights = imbalanced_sample_weights(labels)
        # Each CLASS gets equal total mass despite 9:1 imbalance.
        assert abs(weights[:9].sum() - weights[9]) < 1e-9

    def test_multispeaker_training_and_checkpoint(
        self, multispeaker_corpus, tmp_path
    ):
        config, _ = multispeaker_corpus
        train = generic_psv_filelist_reader(config.training.training_filelist)
        val = generic_psv_filelist_reader(config.training.validation_filelist)
        lang2id, speaker2id = lookuptables_from_data((train, val))
        ds = FastSpeech2Dataset(train, config, lang2id, speaker2id)
        trainer = FastSpeech2Trainer(
            config, ds, ds, lang2id, speaker2id,
            mesh=make_mesh(jax.devices("cpu")[:2]), run_dir=tmp_path,
        )
        params = trainer.fit(max_steps=1, log_every=1)
        header = load_checkpoint_header(tmp_path / "checkpoints" / "last.ckpt")
        assert len(header["hyper_parameters"]["speaker2id"]) >= 2
        # Different speaker ids produce different mels.
        import jax.numpy as jnp

        batch = next(ds.batches(2, shuffle=False))
        out0 = trainer.model.apply(
            params, jnp.asarray(batch["text"]),
            jnp.asarray(batch["text_lengths"]),
            speaker_id=jnp.asarray([0, 0]),
        )
        out1 = trainer.model.apply(
            params, jnp.asarray(batch["text"]),
            jnp.asarray(batch["text_lengths"]),
            speaker_id=jnp.asarray([1, 1]),
        )
        assert not np.allclose(
            np.asarray(out0["postnet_mel"]), np.asarray(out1["postnet_mel"])
        )


@pytest.mark.slow
class TestMultiLingual:
    def test_two_language_pipeline(self, tmp_path):
        """Language columns propagate through preprocessing, lookups, and
        conditioning (BASELINE config #4, multilingual half)."""
        # Build a 2-language filelist over the LJ wavs.
        rows = []
        wavs = sorted((LJ_DATA / "lj" / "wavs").glob("*.wav"))
        for i, wav in enumerate(wavs[:4]):
            rows.append(
                f"{wav.stem}|hello world|{'eng' if i % 2 == 0 else 'fra'}|default"
            )
        filelist = tmp_path / "bilingual.psv"
        filelist.write_text(
            "basename|characters|language|speaker\n" + "\n".join(rows) + "\n"
        )
        config = FastSpeech2Config(
            contact=CONTACT,
            model={
                "multilingual": True,
                "encoder": {"layers": 1, "input_dim": 64,
                            "feedforward_dim": 128, "conv_kernel_size": 3},
                "decoder": {"layers": 1, "input_dim": 64,
                            "feedforward_dim": 128, "conv_kernel_size": 3},
                "variance_predictors": {
                    "energy": {"n_layers": 1, "input_dim": 64},
                    "duration": {"n_layers": 1, "input_dim": 64},
                    "pitch": {"n_layers": 1, "input_dim": 64},
                },
                "max_length": 768,
            },
            preprocessing=PreprocessingConfig(
                save_dir=tmp_path / "preprocessed",
                train_split=0.75,
                source_data=[
                    Dataset(
                        label="BI", permissions_obtained=True,
                        data_dir=LJ_DATA / "lj" / "wavs", filelist=filelist,
                    )
                ],
            ),
            text=TextConfig(
                symbols={"letters": list("abcdefghijklmnopqrstuvwxyz")}
            ),
        )
        Preprocessor(config).preprocess(
            to_process=("audio", "text", "spec", "attn", "energy", "pitch"),
            overwrite=True,
        )
        save_dir = config.preprocessing.save_dir
        # Language encoded in artifact filenames.
        assert list(Path(save_dir, "spec").glob("*--default--eng--*.npy"))
        assert list(Path(save_dir, "spec").glob("*--default--fra--*.npy"))
        train = generic_psv_filelist_reader(save_dir / "training_filelist.psv")
        val = generic_psv_filelist_reader(save_dir / "validation_filelist.psv")
        lang2id, _ = lookuptables_from_data((train, val))
        assert set(lang2id) == {"eng", "fra"}
        config.training.training_filelist = save_dir / "training_filelist.psv"
        config.training.validation_filelist = save_dir / "validation_filelist.psv"
        ds = FastSpeech2Dataset(train, config, lang2id, {"default": 0})
        batch = next(ds.batches(2, shuffle=False))
        assert set(np.unique(batch["language_id"])) <= {0, 1}

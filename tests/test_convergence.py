"""Losses must actually FALL — the CI-tier convergence gates.

The chip-scale gates (production geometry, 2000/1000 steps) live in
tools/convergence_check.py; these reduced-geometry versions prove the same
thing on the CPU mesh within the slow tier's budget: end-to-end gradients
train the models rather than merely compiling (reference analog:
MAX_STEPS=1000 regression runs, reference
tests/regression/regression-test.sh:43-44).
"""

import json

import numpy as np
import pytest

from everyvoice_tpu.utils import generic_psv_filelist_reader

CONTACT = {"contact_name": "Test Runner", "contact_email": "info@everyvoice.ca"}


def _series(run_dir, key):
    records = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
    ]
    return [r[key] for r in records if key in r]


def _drop_factor(series, n=3):
    first = float(np.mean(series[:n]))
    last = float(np.mean(series[-n:]))
    return first / max(last, 1e-9), first, last


@pytest.mark.slow
class TestFS2Converges:
    def test_total_loss_falls(self, lj_corpus, tmp_path):
        from everyvoice_tpu.dataloader import FastSpeech2Dataset
        from everyvoice_tpu.text.lookups import lookuptables_from_data
        from everyvoice_tpu.train.loop import FastSpeech2Trainer

        config, _ = lj_corpus
        config = config.model_copy(deep=True)
        config.training.batch_size = 4
        config.training.val_check_interval = 150
        config.training.max_epochs = 10 ** 9
        train = generic_psv_filelist_reader(config.training.training_filelist)
        val = generic_psv_filelist_reader(
            config.training.validation_filelist
        )
        lang2id, speaker2id = lookuptables_from_data((train, val))
        ds = FastSpeech2Dataset(train, config, lang2id, speaker2id)
        vds = FastSpeech2Dataset(val, config, lang2id, speaker2id,
                                 text_processor=ds.text_processor)
        trainer = FastSpeech2Trainer(
            config, ds, vds, lang2id, speaker2id, run_dir=tmp_path,
        )
        trainer.fit(max_steps=300, log_every=10)
        factor, first, last = _drop_factor(_series(tmp_path, "training/total"))
        assert factor >= 1.5, (
            f"FS2 total loss did not fall: {first:.3f} -> {last:.3f}"
        )
        mel_factor, m_first, m_last = _drop_factor(
            _series(tmp_path, "training/mel")
        )
        assert mel_factor > 1.1, (
            f"FS2 mel loss did not fall: {m_first:.3f} -> {m_last:.3f}"
        )


@pytest.mark.slow
class TestHiFiGANConverges:
    def test_mel_l1_falls(self, lj_corpus, tmp_path):
        from everyvoice_tpu.dataloader import HiFiGANDataset
        from everyvoice_tpu.models.hifigan import HiFiGANConfig
        from everyvoice_tpu.train.loop import HiFiGANTrainer

        fs2_config, save_dir = lj_corpus
        config = HiFiGANConfig(
            contact=CONTACT,
            model={
                "upsample_rates": [8, 8, 2, 2],
                "upsample_kernel_sizes": [16, 16, 4, 4],
                "upsample_initial_channel": 32,
                "resblock_kernel_sizes": [3],
                "resblock_dilation_sizes": [[1, 3]],
                "mpd_layers": [2, 3],
                "msd_layers": 1,
            },
            preprocessing=fs2_config.preprocessing.model_dump(),
        )
        config.preprocessing.save_dir = save_dir
        config.preprocessing.audio.vocoder_segment_size = 4096
        config.training.training_filelist = (
            fs2_config.training.training_filelist
        )
        config.training.validation_filelist = (
            fs2_config.training.validation_filelist
        )
        config.training.batch_size = 4
        config.training.val_check_interval = 100
        config.training.max_epochs = 10 ** 9
        train = generic_psv_filelist_reader(config.training.training_filelist)
        ds = HiFiGANDataset(train, config)
        trainer = HiFiGANTrainer(config, ds, ds, run_dir=tmp_path)
        trainer.fit(max_steps=200, log_every=10)
        factor, first, last = _drop_factor(_series(tmp_path, "training/gen/mel"))
        assert factor >= 1.2, (
            f"HiFiGAN mel-L1 did not fall: {first:.3f} -> {last:.3f}"
        )

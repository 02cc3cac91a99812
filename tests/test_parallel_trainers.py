"""FSDP-vs-DP equivalence for the two-optimizer GAN trainers.

`tests/test_parallel.py::TestFSDP` proves parameter-sharded training
matches pure data parallelism for the FastSpeech2 step function only.
These tests run the production `fit` loops of HiFiGANTrainer and
StyleTTS2Trainer on the 8-device virtual CPU mesh under `--strategy fsdp`
(train/loop.py:865-881, models/styletts2/train.py:998-1019), including
the resume path that transfers a restored optimizer state into the
sharded layouts — the multi-device configuration the reference reserves
for its most expensive model (`-a gpu -d 4`, reference
docs/guides/styletts2.md:94).
"""

import jax
import numpy as np
import pytest

from everyvoice_tpu.models.styletts2.config import StyleTTS2Config
from everyvoice_tpu.parallel import make_mesh
from everyvoice_tpu.utils import generic_psv_filelist_reader

CONTACT = {"contact_name": "Test Runner", "contact_email": "info@everyvoice.ca"}


def _assert_trees_close(tree_a, tree_b, rtol=2e-4, atol=2e-5,
                        outlier_atol=3e-4, outlier_frac=1e-3):
    """Two-tier closeness: the bulk of elements must agree to atol=2e-5,
    but up to outlier_frac of a leaf's elements may diverge by up to
    outlier_atol (= 3 Adam update quanta at lr=1e-4). Rationale: FSDP
    changes the cross-device gradient reduction ORDER, and for an element
    whose true gradient is ~0 the f32 rounding difference can flip the
    gradient's sign — Adam's normalized first step then moves that element
    by ~±lr in opposite directions under DP vs FSDP. Observed: ~0.03% of
    elements differ by up to 2e-4 (= 2 lr), the rest agree to <2e-5. The
    tight bulk tolerance still catches real sharding/layout bugs (which
    perturb far more than 0.1% of elements)."""
    leaves_a = jax.tree_util.tree_leaves_with_path(jax.device_get(tree_a))
    leaves_b = jax.tree_util.tree_leaves(jax.device_get(tree_b))
    assert len(leaves_a) == len(leaves_b)
    n_bad = n_total = 0
    for (path, a), b in zip(leaves_a, leaves_b):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        assert a.shape == b.shape, jax.tree_util.keystr(path)
        err = np.abs(a - b)
        bound = atol + rtol * np.abs(b)
        bad = err > bound
        n_bad += int(bad.sum())
        n_total += bad.size
        if not bad.any():
            continue
        # Every outlier must stay within the Adam-quantum envelope.
        np.testing.assert_allclose(
            a[bad], b[bad], rtol=rtol, atol=outlier_atol,
            err_msg=jax.tree_util.keystr(path),
        )
    # ... and outliers must be rare ACROSS THE TREE (a per-leaf fraction
    # would flag a single sign-flip in a small bias vector).
    assert n_total == 0 or n_bad / n_total <= outlier_frac, (
        f"{n_bad}/{n_total} = {n_bad / n_total:.3%} of elements exceed "
        f"atol={atol} (allowed {outlier_frac:.2%} sign-flip outliers)"
    )


def _count_sharded_leaves(tree) -> int:
    from jax.sharding import PartitionSpec

    n = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        sharding = getattr(leaf, "sharding", None)
        spec = getattr(sharding, "spec", None)
        if spec is not None and spec != PartitionSpec():
            n += 1
    return n


def _hifigan_config(fs2_config):
    from everyvoice_tpu.models.hifigan import HiFiGANConfig

    cfg = HiFiGANConfig(
        contact=CONTACT,
        model={
            "upsample_rates": [8, 8, 2, 2],
            "upsample_kernel_sizes": [16, 16, 4, 4],
            # conv_pre kernel (7, 80, 32) = 17,920 elements with 80 % 8 == 0,
            # so ZeRO-3 really shards it on the 8-device mesh (the
            # equivalence below is not vacuous).
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
            "mpd_layers": [2, 3],
            "msd_layers": 1,
        },
        preprocessing=fs2_config.preprocessing.model_dump(),
    )
    cfg.preprocessing.save_dir = fs2_config.preprocessing.save_dir
    cfg.preprocessing.audio.vocoder_segment_size = 4096
    cfg.training.training_filelist = fs2_config.training.training_filelist
    cfg.training.validation_filelist = fs2_config.training.validation_filelist
    cfg.training.batch_size = 2
    return cfg


def _styletts2_config(fs2_config, save_dir):
    config = StyleTTS2Config(
        contact=CONTACT,
        model={
            # hidden_dim 64 puts the LSTM kernels at (64, 256) = 16,384
            # elements with 256 % 8 == 0 — ZeRO-3-sharded on 8 devices.
            "hidden_dim": 64, "style_dim": 32, "max_dur": 20,
            "decoder": {
                "upsample_initial_channel": 32,
                "resblock_kernel_sizes": [3],
                "resblock_dilation_sizes": [[1, 3]],
                "mpd_layers": [2], "msd_layers": 1,
            },
            "diffusion": {"transformer": {"num_layers": 1, "num_heads": 2,
                                          "head_features": 16}},
        },
        preprocessing=fs2_config.preprocessing.model_dump(),
        text=fs2_config.text.model_dump(),
    )
    config.preprocessing.save_dir = save_dir
    config.training.training_filelist = save_dir / "training_filelist.psv"
    config.training.validation_filelist = save_dir / "validation_filelist.psv"
    config.training.batch_size = 2
    config.training.max_len = 128
    return config


@pytest.mark.slow
class TestHiFiGANFSDP:
    def test_fit_fsdp_matches_dp_and_resumes(self, lj_corpus, tmp_path):
        """Two production GAN steps (both optimizer updates) under FSDP
        reproduce the DP result, and a resume from a DP checkpoint restores
        the optimizer state into the sharded layouts
        (train/loop.py:865-881)."""
        from everyvoice_tpu.dataloader import HiFiGANDataset
        from everyvoice_tpu.train import HiFiGANTrainer, load_checkpoint_header

        fs2_config, _ = lj_corpus
        cfg = _hifigan_config(fs2_config)
        train = generic_psv_filelist_reader(cfg.training.training_filelist)
        ds = HiFiGANDataset(train, cfg)
        assert len(ds) > 0

        results = {}
        for label, fsdp in (("dp", False), ("fsdp", True)):
            mesh = make_mesh(jax.devices("cpu")[:8])
            trainer = HiFiGANTrainer(
                cfg.model_copy(deep=True), ds, ds, mesh=mesh,
                run_dir=tmp_path / label, fsdp=fsdp,
            )
            gen_params, disc_params = trainer.fit(max_steps=2, log_every=1)
            if fsdp:
                assert _count_sharded_leaves(gen_params) > 0, (
                    "no generator parameter was FSDP-sharded — the "
                    "equivalence check would be vacuous"
                )
            results[label] = (gen_params, disc_params)

        _assert_trees_close(results["dp"][0], results["fsdp"][0])
        _assert_trees_close(results["dp"][1], results["fsdp"][1])

        # Resume the DP checkpoint under both layouts: the restored Adam
        # moments must transfer into the sharded layout, so both resumed
        # runs take the same third step.
        ckpt = tmp_path / "dp" / "checkpoints" / "last.ckpt"
        assert ckpt.exists()
        resumed = {}
        for label, fsdp in (("dp", False), ("fsdp", True)):
            cfg2 = cfg.model_copy(deep=True)
            cfg2.training.finetune_checkpoint = ckpt
            mesh = make_mesh(jax.devices("cpu")[:8])
            trainer = HiFiGANTrainer(
                cfg2, ds, ds, mesh=mesh,
                run_dir=tmp_path / f"resume_{label}", fsdp=fsdp,
            )
            gen_params, _ = trainer.fit(max_steps=3, log_every=1)
            assert trainer.global_step == 3
            resumed[label] = gen_params
        _assert_trees_close(resumed["dp"], resumed["fsdp"])
        header = load_checkpoint_header(
            tmp_path / "resume_fsdp" / "checkpoints" / "last.ckpt"
        )
        assert header["global_step"] == 3


@pytest.mark.slow
class TestStyleTTS2FSDP:
    def test_fit_fsdp_matches_dp(self, lj_corpus, tmp_path):
        """One stage-1 step of the production StyleTTS2 fit loop under FSDP
        reproduces the DP result (models/styletts2/train.py:998-1019)."""
        from everyvoice_tpu.dataloader import StyleTTS2Dataset
        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer

        fs2_config, save_dir = lj_corpus
        cfg = _styletts2_config(fs2_config, save_dir)
        train = generic_psv_filelist_reader(cfg.training.training_filelist)
        ds = StyleTTS2Dataset(train, cfg)
        assert len(ds) > 0

        results = {}
        for label, fsdp in (("dp", False), ("fsdp", True)):
            mesh = make_mesh(jax.devices("cpu")[:8])
            trainer = StyleTTS2Trainer(
                cfg.model_copy(deep=True), ds, ds, mesh=mesh,
                run_dir=tmp_path / label, mode="first", fsdp=fsdp,
            )
            gen_params, disc_params = trainer.fit(max_steps=1, log_every=1)
            if fsdp:
                assert _count_sharded_leaves(gen_params) > 0, (
                    "no generator parameter was FSDP-sharded — the "
                    "equivalence check would be vacuous"
                )
            results[label] = (gen_params, disc_params)

        _assert_trees_close(results["dp"][0], results["fsdp"][0])
        _assert_trees_close(results["dp"][1], results["fsdp"][1])

    def test_kill_and_resume_under_fsdp(self, lj_corpus, tmp_path):
        """Kill a stage-1 run after one step, then resume under FSDP: the
        restored optimizer moments must transfer into the ZeRO-3 layouts
        (models/styletts2/train.py:1006-1014), proven by the resumed-FSDP
        run taking the same second step as a resumed-DP run."""
        from everyvoice_tpu.dataloader import StyleTTS2Dataset
        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
        from everyvoice_tpu.train import load_checkpoint_header

        fs2_config, save_dir = lj_corpus
        cfg = _styletts2_config(fs2_config, save_dir)
        train = generic_psv_filelist_reader(cfg.training.training_filelist)
        ds = StyleTTS2Dataset(train, cfg)

        mesh = make_mesh(jax.devices("cpu")[:8])
        run1 = tmp_path / "run1"
        StyleTTS2Trainer(
            cfg.model_copy(deep=True), ds, ds, mesh=mesh, run_dir=run1,
            mode="first",
        ).fit(max_steps=1, log_every=1)
        ckpt = run1 / "checkpoints" / "stage-1-last.ckpt"
        assert ckpt.exists()

        resumed = {}
        for label, fsdp in (("dp", False), ("fsdp", True)):
            cfg2 = cfg.model_copy(deep=True)
            cfg2.training.finetune_checkpoint = ckpt
            mesh = make_mesh(jax.devices("cpu")[:8])
            trainer = StyleTTS2Trainer(
                cfg2, ds, ds, mesh=mesh, run_dir=tmp_path / f"resume_{label}",
                mode="first", fsdp=fsdp,
            )
            gen_params, _ = trainer.fit(max_steps=2, log_every=1)
            assert trainer.global_step == 2
            resumed[label] = gen_params
        _assert_trees_close(resumed["dp"], resumed["fsdp"])
        header = load_checkpoint_header(
            tmp_path / "resume_fsdp" / "checkpoints" / "stage-1-last.ckpt"
        )
        assert header["global_step"] == 2
        assert header["stage"] == "first"

"""Pretrained StyleTTS2 component tests: torch→flax converters for PL-BERT /
JDC-F0 / ASR-aligner, symbol-table remapping, and — the contract that
matters — that staging local checkpoints via the `pretrained.*.local_*`
config fields demonstrably changes the trained model (reference
docs/guides/styletts2.md:7-13; fetch-pretrained cli.py:622-644).

The state-dict fixtures are built in numpy with the exact torch
`state_dict()` key layout, staged as `.npz` (the loaders accept torch
checkpoints or same-keyed npz archives), so every test here runs without
torch installed. Numeric parity against real torch modules is covered by
tests/test_styletts2_goldens.py's committed fixtures.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from everyvoice_tpu.models.styletts2.config import (
    PRETRAINED_SYMBOL_TABLE,
    StyleTTS2Config,
)

CONTACT = {"contact_name": "Test Runner", "contact_email": "info@everyvoice.ca"}

# ---------------------------------------------------------------------------
# numpy state-dict builders (torch state_dict key layout)


def make_albert_state(rng, vocab=178, hidden=32, heads=2, inter=64, emb=16,
                      maxpos=64):
    """A tiny `transformers.AlbertModel.state_dict()`-shaped mapping."""
    r = rng.standard_normal

    def lin(o, i):
        return r((o, i)).astype(np.float32) * 0.05, np.zeros(o, np.float32)

    state = {
        "embeddings.word_embeddings.weight": r((vocab, emb)).astype(np.float32),
        "embeddings.position_embeddings.weight": r((maxpos, emb)).astype(np.float32),
        "embeddings.token_type_embeddings.weight": r((2, emb)).astype(np.float32),
        "embeddings.LayerNorm.weight": np.ones(emb, np.float32),
        "embeddings.LayerNorm.bias": np.zeros(emb, np.float32),
    }
    k, b = lin(hidden, emb)
    state["encoder.embedding_hidden_mapping_in.weight"] = k
    state["encoder.embedding_hidden_mapping_in.bias"] = b
    lp = "encoder.albert_layer_groups.0.albert_layers.0"
    for name, (o, i) in {
        "attention.query": (hidden, hidden),
        "attention.key": (hidden, hidden),
        "attention.value": (hidden, hidden),
        "attention.dense": (hidden, hidden),
        "ffn": (inter, hidden),
        "ffn_output": (hidden, inter),
    }.items():
        k, b = lin(o, i)
        state[f"{lp}.{name}.weight"] = k
        state[f"{lp}.{name}.bias"] = b
    for norm in ("attention.LayerNorm", "full_layer_layer_norm"):
        state[f"{lp}.{norm}.weight"] = np.ones(hidden, np.float32)
        state[f"{lp}.{norm}.bias"] = np.zeros(hidden, np.float32)
    return state


def make_jdc_state(rng):
    """A `JDCNet.state_dict()`-shaped mapping (fixed published geometry:
    conv 64 → res 128/192/256 → BiLSTM 256)."""
    r = rng.standard_normal

    def conv(o, i, k=3):
        return r((o, i, k, k)).astype(np.float32) * 0.05

    def bn(prefix, ch):
        return {
            f"{prefix}.weight": np.ones(ch, np.float32),
            f"{prefix}.bias": np.zeros(ch, np.float32),
            f"{prefix}.running_mean": np.zeros(ch, np.float32),
            f"{prefix}.running_var": np.ones(ch, np.float32),
        }

    state = {
        "conv_block.0.weight": conv(64, 1),
        "conv_block.3.weight": conv(64, 64),
        **bn("conv_block.1", 64),
        **bn("pool_block.0", 256),
    }
    for idx, (i, o) in enumerate([(64, 128), (128, 192), (192, 256)], 1):
        p = f"res_block{idx}"
        state.update(bn(f"{p}.pre_conv.0", i))
        state[f"{p}.conv.0.weight"] = conv(o, i)
        state.update(bn(f"{p}.conv.1", o))
        state[f"{p}.conv.3.weight"] = conv(o, o)
        state[f"{p}.conv1by1.weight"] = conv(o, i, 1)
    h, feat = 256, 512
    lstm = "bilstm_classifier"
    for suffix in ("", "_reverse"):
        state[f"{lstm}.weight_ih_l0{suffix}"] = r((4 * h, feat)).astype(np.float32) * 0.02
        state[f"{lstm}.weight_hh_l0{suffix}"] = r((4 * h, h)).astype(np.float32) * 0.02
        state[f"{lstm}.bias_ih_l0{suffix}"] = np.zeros(4 * h, np.float32)
        state[f"{lstm}.bias_hh_l0{suffix}"] = np.zeros(4 * h, np.float32)
    state["classifier.weight"] = r((1, 2 * h)).astype(np.float32) * 0.05
    state["classifier.bias"] = np.zeros(1, np.float32)
    return state


def make_asr_state(rng, n_token=178, hidden=32, n_layers=2, emb=24):
    """An `ASRCNN.state_dict()`-shaped mapping."""
    r = rng.standard_normal

    def conv1d(o, i, k):
        return r((o, i, k)).astype(np.float32) * 0.05

    state = {
        "init_cnn.conv.weight": conv1d(hidden, 40, 7),
        "init_cnn.conv.bias": np.zeros(hidden, np.float32),
        "projection.conv.weight": conv1d(hidden // 2, hidden, 1),
        "projection.conv.bias": np.zeros(hidden // 2, np.float32),
        "ctc_linear.0.linear_layer.weight": r((hidden, hidden // 2)).astype(np.float32) * 0.05,
        "ctc_linear.0.linear_layer.bias": np.zeros(hidden, np.float32),
        "ctc_linear.2.linear_layer.weight": r((n_token, hidden)).astype(np.float32) * 0.05,
        "ctc_linear.2.linear_layer.bias": np.zeros(n_token, np.float32),
    }
    for i in range(n_layers):
        for j in range(3):
            inner = f"cnns.{i}.0.blocks.{j}"
            state[f"{inner}.0.conv.weight"] = conv1d(hidden, hidden, 3)
            state[f"{inner}.0.conv.bias"] = np.zeros(hidden, np.float32)
            state[f"{inner}.2.weight"] = np.ones(hidden, np.float32)
            state[f"{inner}.2.bias"] = np.zeros(hidden, np.float32)
            state[f"{inner}.4.conv.weight"] = conv1d(hidden, hidden, 3)
            state[f"{inner}.4.conv.bias"] = np.zeros(hidden, np.float32)
        state[f"cnns.{i}.1.weight"] = np.ones(hidden, np.float32)
        state[f"cnns.{i}.1.bias"] = np.zeros(hidden, np.float32)
    h = hidden // 2
    a = "asr_s2s.attention_layer"
    state.update({
        "asr_s2s.embedding.weight": r((n_token, emb)).astype(np.float32) * 0.1,
        "asr_s2s.decoder_rnn.weight_ih": r((4 * h, emb + h)).astype(np.float32) * 0.05,
        "asr_s2s.decoder_rnn.weight_hh": r((4 * h, h)).astype(np.float32) * 0.05,
        "asr_s2s.decoder_rnn.bias_ih": np.zeros(4 * h, np.float32),
        "asr_s2s.decoder_rnn.bias_hh": np.zeros(4 * h, np.float32),
        f"{a}.query_layer.linear_layer.weight": r((h, h)).astype(np.float32) * 0.05,
        f"{a}.memory_layer.linear_layer.weight": r((h, h)).astype(np.float32) * 0.05,
        f"{a}.v.linear_layer.weight": r((1, h)).astype(np.float32) * 0.05,
        f"{a}.location_layer.location_conv.conv.weight":
            r((32, 2, 63)).astype(np.float32) * 0.05,
        f"{a}.location_layer.location_dense.linear_layer.weight":
            r((h, 32)).astype(np.float32) * 0.05,
        "asr_s2s.project_to_hidden.0.linear_layer.weight":
            r((h, 2 * h)).astype(np.float32) * 0.05,
        "asr_s2s.project_to_hidden.0.linear_layer.bias": np.zeros(h, np.float32),
        "asr_s2s.project_to_n_symbols.weight": r((n_token, h)).astype(np.float32) * 0.05,
        "asr_s2s.project_to_n_symbols.bias": np.zeros(n_token, np.float32),
    })
    return state


def stage_npz(path, state):
    np.savez(path, **state)
    return path


# ---------------------------------------------------------------------------


class TestSymbolTable:
    def test_frozen_table_matches_plbert_vocab(self):
        from everyvoice_tpu.models.styletts2.plbert import MULTILINGUAL_PLBERT

        assert len(PRETRAINED_SYMBOL_TABLE) == MULTILINGUAL_PLBERT["vocab_size"]
        assert PRETRAINED_SYMBOL_TABLE[0] == "$"
        # basic Latin and common IPA must be present for LJ-style corpora
        for symbol in ("a", "z", " ", ".", "ə", "ˈ"):
            assert symbol in PRETRAINED_SYMBOL_TABLE

    def test_symbol_row_map(self):
        from everyvoice_tpu.models.styletts2.plbert import symbol_row_map

        rows = symbol_row_map(["a", "\x80", "b"], PRETRAINED_SYMBOL_TABLE)
        assert rows[0] == PRETRAINED_SYMBOL_TABLE.index("a")
        assert rows[1] == -1  # pad byte is not in the pretrained table
        assert rows[2] == PRETRAINED_SYMBOL_TABLE.index("b")


class TestPLBERTConversion:
    def test_convert_and_forward(self):
        from everyvoice_tpu.models.styletts2.plbert import (
            PLBERT,
            convert_torch_plbert_state,
        )

        rng = np.random.default_rng(0)
        state = make_albert_state(rng, vocab=30)
        params = convert_torch_plbert_state(state)
        module = PLBERT(vocab_size=30, hidden_size=32, num_layers=2,
                        num_heads=2, intermediate_size=64, embedding_size=16,
                        max_position_embeddings=64)
        tokens = jnp.asarray([[1, 4, 9, 2, 0, 0]], jnp.int32)
        mask = tokens > 0
        out = module.apply({"params": params}, tokens, mask)
        assert out.shape == (1, 6, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_training_prefix_stripping(self):
        from everyvoice_tpu.models.styletts2.plbert import (
            strip_plbert_training_prefixes,
        )

        wrapped = {
            "net": {
                "module.encoder.embeddings.word_embeddings.weight": 1,
                "module.encoder.encoder.embedding_hidden_mapping_in.weight": 2,
            }
        }
        flat = strip_plbert_training_prefixes(wrapped)
        assert flat == {
            "embeddings.word_embeddings.weight": 1,
            "encoder.embedding_hidden_mapping_in.weight": 2,
        }

    def test_symbol_remap_moves_rows(self):
        from everyvoice_tpu.models.styletts2.plbert import (
            convert_torch_plbert_state,
        )

        rng = np.random.default_rng(1)
        state = make_albert_state(rng, vocab=10)
        rows = np.asarray([3, -1, 7])
        params = convert_torch_plbert_state(state, symbol_rows=rows)
        word = params["word_embeddings"]
        source = state["embeddings.word_embeddings.weight"]
        assert word.shape[0] == 3
        np.testing.assert_array_equal(word[0], source[3])
        np.testing.assert_array_equal(word[1], np.zeros_like(word[1]))
        np.testing.assert_array_equal(word[2], source[7])


class TestJDCConversion:
    def test_loader_and_f0(self, tmp_path):
        from everyvoice_tpu.models.styletts2.jdc import jdc_f0, load_jdc_params

        rng = np.random.default_rng(2)
        path = stage_npz(tmp_path / "bst.npz", make_jdc_state(rng))
        module, params = load_jdc_params(path)
        mel = jnp.asarray(rng.standard_normal((2, 24, 80)), jnp.float32)
        f0 = jdc_f0(module, params, mel)
        assert f0.shape == (2, 24)
        assert (np.asarray(f0) >= 0).all()


class TestASRConversion:
    def test_convert_forward_and_tma_adapter(self):
        from everyvoice_tpu.models.styletts2.asr import (
            ASRCNN,
            asr_attention_to_tma,
            convert_torch_asr_state,
        )

        rng = np.random.default_rng(3)
        state = make_asr_state(rng, n_token=20)
        params = convert_torch_asr_state(state, n_layers=2)
        module = ASRCNN(n_token=20, input_dim=80, hidden_dim=32, n_layers=2,
                        token_embedding_dim=24)
        mel = jnp.asarray(rng.standard_normal((2, 24, 80)), jnp.float32)
        mel_lengths = jnp.asarray([24, 16])
        text = jnp.asarray([[1, 4, 9, 2], [5, 3, 0, 0]], jnp.int32)
        ctc, s2s_logits, attn = module.apply(
            {"params": params}, mel, mel_lengths, text
        )
        assert ctc.shape == (2, 12, 20)
        assert s2s_logits.shape == (2, 5, 20)
        assert attn.shape == (2, 5, 12)
        # attention rows are distributions over valid memory positions
        np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, rtol=1e-4)
        assert np.asarray(attn)[1, :, 8:].max() < 1e-6  # masked beyond 16/2
        src_mask = text > 0
        mel_mask = jnp.arange(24)[None, :] < mel_lengths[:, None]
        soft, logprob = asr_attention_to_tma(attn, 24, src_mask, mel_mask)
        assert soft.shape == (2, 24, 4)
        assert logprob.shape == (2, 24, 4)
        assert np.asarray(soft)[1, 16:].max() == 0.0  # mel mask applied
        assert np.asarray(logprob)[0, :, :][..., 0].max() <= 0.0

    def test_symbol_remap_and_sos(self):
        from everyvoice_tpu.models.styletts2.asr import convert_torch_asr_state

        rng = np.random.default_rng(4)
        state = make_asr_state(rng, n_token=10)
        rows = np.asarray([2, -1, 5])
        params = convert_torch_asr_state(
            state, n_layers=2, symbol_rows=rows, sos_index=1
        )
        emb = state["asr_s2s.embedding.weight"]
        np.testing.assert_array_equal(params["s2s"]["embedding"][0], emb[2])
        np.testing.assert_array_equal(params["s2s"]["sos_embedding"], emb[1])
        assert params["s2s"]["proj_symbols_kernel"].shape == (16, 3)


# ---------------------------------------------------------------------------
# the wiring: staged local checkpoints change the trained model


def styletts2_tiny_config(fs2_config, save_dir):
    config = StyleTTS2Config(
        contact=CONTACT,
        model={
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


@pytest.fixture(scope="module")
def staged_components(tmp_path_factory):
    """All three pretrained components staged as npz + geometry yml files."""
    import yaml

    root = tmp_path_factory.mktemp("pretrained")
    rng = np.random.default_rng(7)
    jdc = stage_npz(root / "bst.npz", make_jdc_state(rng))
    plbert = stage_npz(
        root / "plbert.npz",
        make_albert_state(rng, vocab=178, hidden=32, heads=2, inter=64,
                          emb=16, maxpos=512),
    )
    plbert_yml = root / "plbert_config.yml"
    plbert_yml.write_text(yaml.safe_dump({"model_params": {
        "vocab_size": 178, "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 2, "intermediate_size": 64,
        "embedding_size": 16, "max_position_embeddings": 512,
    }}), encoding="utf8")
    asr = stage_npz(
        root / "asr.npz",
        make_asr_state(rng, n_token=178, hidden=32, n_layers=2, emb=24),
    )
    asr_yml = root / "asr_config.yml"
    asr_yml.write_text(yaml.safe_dump({"model_params": {
        "input_dim": 80, "hidden_dim": 32, "n_token": 178, "n_layers": 2,
        "token_embedding_dim": 24,
    }}), encoding="utf8")
    return {"jdc": jdc, "plbert": plbert, "plbert_yml": plbert_yml,
            "asr": asr, "asr_yml": asr_yml}


@pytest.mark.slow
class TestPretrainedWiring:
    def test_staged_checkpoints_change_training(
        self, lj_corpus, staged_components, tmp_path
    ):
        """The full VERDICT-#1 contract: every `-c pretrained.*.local_*`
        override printed by fetch-pretrained is consumed — the module grows
        plbert/text_aligner submodules initialized from the staged weights,
        JDC supplies F0 targets, training steps run, the checkpoint records
        the component geometry, and synthesis reloads the same structure."""
        from everyvoice_tpu.dataloader import StyleTTS2Dataset
        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
        from everyvoice_tpu.parallel import make_mesh
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        fs2_config, save_dir = lj_corpus
        config = styletts2_tiny_config(fs2_config, save_dir)
        config.pretrained.f0.local_path = staged_components["jdc"]
        config.pretrained.plbert.local_checkpoint = staged_components["plbert"]
        config.pretrained.plbert.local_config = staged_components["plbert_yml"]
        config.pretrained.asr.local_checkpoint = staged_components["asr"]
        config.pretrained.asr.local_config = staged_components["asr_yml"]
        train = generic_psv_filelist_reader(config.training.training_filelist)
        ds = StyleTTS2Dataset(train, config)
        mesh = make_mesh(jax.devices("cpu")[:2])
        trainer = StyleTTS2Trainer(
            config, ds, ds, mesh=mesh, run_dir=tmp_path, mode="first",
        )
        # components were recognized
        assert trainer.jdc_module is not None
        assert trainer.plbert_geometry is not None
        assert trainer.asr_geometry["n_token"] == ds.n_symbols
        assert trainer.plbert_geometry["vocab_size"] == ds.n_symbols
        assert trainer.model.plbert_geometry is not None
        assert trainer.model.asr_geometry is not None

        # grafting: the initialized params carry the converted weights, not
        # fresh inits — check a remapped embedding row end to end.
        example = next(ds.batches(2, shuffle=False))
        example.pop("basenames", None)
        gen_params, _disc = trainer.init_params(example)
        word = np.asarray(
            gen_params["params"]["plbert_encoder"]["word_embeddings"]
        )
        source = np.load(staged_components["plbert"])[
            "embeddings.word_embeddings.weight"
        ]
        symbol = "a"
        project_row = ds.text_processor.symbols.index(symbol)
        pretrained_row = PRETRAINED_SYMBOL_TABLE.index(symbol)
        np.testing.assert_allclose(
            word[project_row], source[pretrained_row], rtol=1e-6
        )

        gen_params, disc_params = trainer.fit(max_steps=1, log_every=1)
        last = tmp_path / "checkpoints" / "stage-1-last.ckpt"
        assert last.exists()
        from everyvoice_tpu.train import load_checkpoint_header

        header = load_checkpoint_header(last)
        components = header["pretrained_components"]
        assert components["plbert"]["hidden_size"] == 32
        assert components["asr"]["hidden_dim"] == 32

        # synthesis reloads the same module structure and produces audio
        from everyvoice_tpu.models.styletts2.synthesize import (
            load_styletts2_model,
            synthesize_text,
        )

        model, params, cfg, tp, _ = load_styletts2_model(last)
        assert model.plbert_geometry is not None
        assert model.asr_geometry is not None
        wav = synthesize_text(
            model, params, cfg, tp, "hello world", diffusion_steps=2
        )
        assert wav.ndim == 1 and wav.size > 0
        assert np.isfinite(wav).all()

    def test_missing_staged_file_warns_and_falls_back(
        self, lj_corpus, tmp_path
    ):
        from everyvoice_tpu.dataloader import StyleTTS2Dataset
        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
        from everyvoice_tpu.parallel import make_mesh
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        fs2_config, save_dir = lj_corpus
        config = styletts2_tiny_config(fs2_config, save_dir)
        config.pretrained.f0.local_path = tmp_path / "missing.t7"
        train = generic_psv_filelist_reader(config.training.training_filelist)
        ds = StyleTTS2Dataset(train, config)
        mesh = make_mesh(jax.devices("cpu")[:2])
        trainer = StyleTTS2Trainer(
            config, ds, ds, mesh=mesh, run_dir=tmp_path, mode="first",
        )
        assert trainer.jdc_module is None
        assert trainer.model.plbert_geometry is None


@pytest.mark.slow
class TestStyleTTS2Resume:
    def test_mid_stage_resume(self, lj_corpus, tmp_path):
        """Kill a stage-1 run after one epoch and resume from stage-1-last.ckpt with
        step/epoch intact (reference base_cli/helpers.py:278-375)."""
        from everyvoice_tpu.dataloader import StyleTTS2Dataset
        from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
        from everyvoice_tpu.parallel import make_mesh
        from everyvoice_tpu.train import load_checkpoint_header
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        fs2_config, save_dir = lj_corpus
        config = styletts2_tiny_config(fs2_config, save_dir)
        train = generic_psv_filelist_reader(config.training.training_filelist)
        ds = StyleTTS2Dataset(train, config)
        mesh = make_mesh(jax.devices("cpu")[:2])
        run1 = tmp_path / "run1"
        trainer = StyleTTS2Trainer(
            config, ds, ds, mesh=mesh, run_dir=run1, mode="first",
        )
        trainer.fit(max_steps=1, log_every=1)
        last = run1 / "checkpoints" / "stage-1-last.ckpt"
        header = load_checkpoint_header(last)
        assert header["global_step"] == 1
        assert header["epoch"] == 1
        # checkpoints carry optimizer state for full resume
        assert header.get("stage") == "first"

        config.training.finetune_checkpoint = last
        run2 = tmp_path / "run2"
        resumed = StyleTTS2Trainer(
            config, ds, ds, mesh=mesh, run_dir=run2, mode="first",
        )
        resumed.fit(max_steps=2, log_every=1)
        # one more step only: counters resumed, not restarted
        assert resumed.global_step == 2
        assert resumed.epoch >= 1
        header2 = load_checkpoint_header(run2 / "checkpoints" / "stage-1-last.ckpt")
        assert header2["global_step"] == 2

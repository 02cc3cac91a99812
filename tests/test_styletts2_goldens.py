"""Numeric-parity golden tests for the flax ports of the pretrained
components. The committed fixtures (tests/data/golden_pretrained/*.npz)
carry converted flax params + inputs + expected outputs computed by the
real torch implementations (transformers AlbertModel / WavLMModel /
Wav2Vec2ForCTC, and a torch mirror of the published ASR aligner), so these
tests ASSERT — not skip — in torch-less images, drift-gating the flax
modules against real torch forward passes.

Regenerate with: python tests/data/golden_pretrained/generate_goldens.py
(needs torch + transformers).
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

GOLDEN_DIR = Path(__file__).parent / "data" / "golden_pretrained"


def load_fixture(name):
    from flax.traverse_util import unflatten_dict

    with np.load(GOLDEN_DIR / f"{name}.npz") as archive:
        flat_params = {}
        inputs = {}
        expected = {}
        geometry = {}
        for key in archive.files:
            if key.startswith("params/"):
                flat_params[tuple(key[len("params/"):].split("/"))] = archive[key]
            elif key.startswith("input/"):
                inputs[key[len("input/"):]] = archive[key]
            elif key.startswith("expected/"):
                expected[key[len("expected/"):]] = archive[key]
            elif key == "geometry":
                geometry = json.loads(str(archive[key]))
    params = unflatten_dict(flat_params)
    # some converters return apply-ready {"params": ...} trees
    variables = params if "params" in params else {"params": params}
    return variables, geometry, inputs, expected


class TestPLBERTGolden:
    def test_matches_transformers_albert(self):
        from everyvoice_tpu.models.styletts2.plbert import PLBERT

        variables, geometry, inputs, expected = load_fixture("plbert")
        module = PLBERT(**geometry)
        out = module.apply(
            variables,
            jnp.asarray(inputs["tokens"], jnp.int32),
            jnp.asarray(inputs["mask"]).astype(bool),
        )
        np.testing.assert_allclose(
            np.asarray(out), expected["hidden"], atol=2e-4, rtol=2e-3
        )


class TestWavLMGolden:
    def test_matches_transformers_wavlm(self):
        from everyvoice_tpu.models.styletts2.slm import (
            WavLM,
            stack_hidden_states,
        )

        variables, geometry, inputs, expected = load_fixture("wavlm")
        geometry["conv_dim"] = tuple(geometry["conv_dim"])
        module = WavLM(**geometry)
        hidden = module.apply(variables, jnp.asarray(inputs["wav"]))
        stacked = np.asarray(stack_hidden_states(hidden))
        np.testing.assert_allclose(
            stacked, expected["stacked_hidden"], atol=5e-4, rtol=5e-3
        )


class TestWav2Vec2Golden:
    def test_matches_transformers_wav2vec2_ctc(self):
        from everyvoice_tpu.models.aligner.wav2vec2 import Wav2Vec2CTC

        variables, geometry, inputs, expected = load_fixture("wav2vec2")
        geometry["conv_dim"] = tuple(geometry["conv_dim"])
        module = Wav2Vec2CTC(**geometry)
        logp = module.apply(variables, jnp.asarray(inputs["wav"]))
        np.testing.assert_allclose(
            np.asarray(logp), expected["log_probs"], atol=5e-4, rtol=5e-3
        )


class TestASRGolden:
    def test_matches_torch_asr_mirror(self):
        from everyvoice_tpu.models.styletts2.asr import ASRCNN

        variables, geometry, inputs, expected = load_fixture("asr")
        module = ASRCNN(**geometry)
        ctc, s2s_logits, attn = module.apply(
            variables,
            jnp.asarray(inputs["mel"]),
            jnp.asarray(inputs["mel_lengths"], jnp.int32),
            jnp.asarray(inputs["text"], jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(ctc), expected["ctc"], atol=2e-4, rtol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(attn), expected["attn"], atol=2e-4, rtol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(s2s_logits), expected["s2s_logits"],
            atol=5e-4, rtol=5e-3,
        )


class TestJDCGolden:
    def test_matches_torch_jdc_mirror_fixture(self):
        """Committed reduced-geometry fixture (every op and the converter
        layout are identical to the published geometry; only the channel
        widths shrink, which keeps the fixture small) — asserts in
        torch-less images like the other four components."""
        from everyvoice_tpu.models.styletts2.jdc import JDCNet

        variables, geometry, inputs, expected = load_fixture("jdc")
        geometry["channels"] = tuple(geometry["channels"])
        module = JDCNet(**geometry)
        out = module.apply(variables, jnp.asarray(inputs["mel"]))
        np.testing.assert_allclose(
            np.asarray(out), expected["f0"], atol=5e-4, rtol=5e-3
        )


class TestJDCParity:
    def test_matches_torch_jdc_mirror_full_geometry(self):
        """Live parity vs the torch mirror at the FULL published geometry
        (BiLSTM 512x256) when torch is available — the committed fixture
        above covers torch-less images at reduced widths."""
        pytest.importorskip("torch")
        import sys

        sys.path.insert(0, str(GOLDEN_DIR))
        try:
            from generate_goldens import _TorchJDC
        finally:
            sys.path.pop(0)
        import torch

        from everyvoice_tpu.models.styletts2.jdc import (
            JDCNet,
            convert_torch_jdc_state,
        )

        torch.manual_seed(0)
        model = _TorchJDC().eval()
        with torch.no_grad():
            for module in model.modules():
                if isinstance(module, torch.nn.BatchNorm2d):
                    module.running_mean.uniform_(-0.5, 0.5)
                    module.running_var.uniform_(0.5, 2.0)
        rng = np.random.default_rng(2)
        mel = rng.standard_normal((2, 16, 80)).astype(np.float32)
        with torch.no_grad():
            expected = model(torch.from_numpy(mel)).numpy()
        params = convert_torch_jdc_state({"net": model.state_dict()})
        out = JDCNet().apply({"params": params}, jnp.asarray(mel))
        np.testing.assert_allclose(
            np.asarray(out), expected, atol=5e-4, rtol=5e-3
        )

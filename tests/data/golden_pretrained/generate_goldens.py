"""Generate committed golden parity fixtures for the flax ports of the
pretrained components (run once on a machine with torch + transformers;
the committed .npz files let tests/test_styletts2_goldens.py assert
numeric parity in torch-less images).

Each fixture stores: the CONVERTED flax parameter tree (flattened with
'/'-joined keys under 'params/'), the module geometry (JSON), the test
input(s), and the expected output computed by the reference torch
implementation. A fixture therefore pins BOTH the converter layout and the
flax module numerics against real torch forward passes.

Usage: python tests/data/golden_pretrained/generate_goldens.py
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

OUT = Path(__file__).resolve().parent
torch.manual_seed(0)


def save_fixture(name, params, geometry, inputs, expected):
    from flax.traverse_util import flatten_dict

    arrays = {
        "params/" + "/".join(k): np.asarray(v)
        for k, v in flatten_dict(params).items()
    }
    for key, value in inputs.items():
        arrays[f"input/{key}"] = np.asarray(value)
    for key, value in expected.items():
        arrays[f"expected/{key}"] = np.asarray(value)
    arrays["geometry"] = np.asarray(json.dumps(geometry))
    np.savez_compressed(OUT / f"{name}.npz", **arrays)
    size = (OUT / f"{name}.npz").stat().st_size
    print(f"{name}.npz: {size/1024:.0f} KiB")


# ---------------------------------------------------------------------------
# PL-BERT (vs transformers.AlbertModel)


def gen_plbert():
    from transformers import AlbertConfig, AlbertModel

    from everyvoice_tpu.models.styletts2.plbert import (
        convert_torch_plbert_state,
    )

    geometry = dict(vocab_size=40, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, embedding_size=16,
                    max_position_embeddings=64)
    cfg = AlbertConfig(
        vocab_size=40, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, embedding_size=16,
        max_position_embeddings=64, num_hidden_groups=1, inner_group_num=1,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    model = AlbertModel(cfg).eval()
    tokens = np.array([[3, 7, 1, 12, 9, 0, 0, 0],
                       [5, 2, 2, 30, 8, 6, 4, 1]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0],
                     [1, 1, 1, 1, 1, 1, 1, 1]], np.int64)
    with torch.no_grad():
        expected = model(
            input_ids=torch.from_numpy(tokens),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    params = convert_torch_plbert_state(model.state_dict())
    save_fixture("plbert", params, geometry,
                 {"tokens": tokens, "mask": mask},
                 {"hidden": expected})


# ---------------------------------------------------------------------------
# WavLM (vs transformers.WavLMModel)


def gen_wavlm():
    from transformers import WavLMConfig, WavLMModel

    from everyvoice_tpu.models.styletts2.slm import convert_torch_wavlm_state

    cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16,) * 7,
        num_buckets=32, max_bucket_distance=80,
        num_conv_pos_embeddings=15, num_conv_pos_embedding_groups=4,
        layerdrop=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, activation_dropout=0.0,
    )
    model = WavLMModel(cfg).eval()
    geometry = dict(hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, conv_dim=[16] * 7,
                    num_buckets=32, max_distance=80,
                    num_conv_pos_embeddings=15,
                    num_conv_pos_embedding_groups=4)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 3200)).astype(np.float32) * 0.1
    with torch.no_grad():
        out = model(torch.from_numpy(wav), output_hidden_states=True)
        # matches slm.stack_hidden_states: concat on the feature axis
        stacked = np.concatenate([h.numpy() for h in out.hidden_states], axis=-1)
    params = convert_torch_wavlm_state(model.state_dict(), cfg.num_hidden_layers)
    save_fixture("wavlm", params, geometry, {"wav": wav},
                 {"stacked_hidden": stacked})


# ---------------------------------------------------------------------------
# wav2vec2-CTC (vs transformers.Wav2Vec2ForCTC)


def gen_wav2vec2():
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

    from everyvoice_tpu.models.aligner.wav2vec2 import (
        convert_torch_wav2vec2_state,
    )

    cfg = Wav2Vec2Config(
        vocab_size=12, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, conv_dim=(16,) * 7,
        num_conv_pos_embeddings=15, num_conv_pos_embedding_groups=4,
        layerdrop=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, activation_dropout=0.0, final_dropout=0.0,
    )
    model = Wav2Vec2ForCTC(cfg).eval()
    geometry = dict(vocab_size=12, hidden_size=32, num_layers=2, num_heads=2,
                    intermediate_size=64, conv_dim=[16] * 7,
                    num_conv_pos_embeddings=15,
                    num_conv_pos_embedding_groups=4,
                    feat_extract_norm=cfg.feat_extract_norm,
                    do_stable_layer_norm=cfg.do_stable_layer_norm,
                    conv_bias=cfg.conv_bias)
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((1, 3200)).astype(np.float32) * 0.1
    with torch.no_grad():
        logits = model(torch.from_numpy(wav)).logits
        logp = torch.log_softmax(logits, dim=-1).numpy()
    params = convert_torch_wav2vec2_state(
        model.state_dict(), cfg.num_hidden_layers, cfg.feat_extract_norm,
        cfg.do_stable_layer_norm,
    )
    save_fixture("wav2vec2", params, geometry, {"wav": wav},
                 {"log_probs": logp})


# ---------------------------------------------------------------------------
# JDC F0 net — torch mirror of the published JDCNet classifier path
# (module/key layout matches yl4579/StyleTTS2 Utils/JDC/model.py, which is
# what the bst.t7 checkpoint stores)


class _TorchJDC(nn.Module):
    def __init__(self, channels=(64, 128, 192, 256), lstm_hidden=256):
        super().__init__()
        c0, c1, c2, c3 = channels
        lrelu = nn.LeakyReLU(0.01)
        self.conv_block = nn.Sequential(
            nn.Conv2d(1, c0, 3, padding=1, bias=False),
            nn.BatchNorm2d(c0), lrelu,
            nn.Conv2d(c0, c0, 3, padding=1, bias=False),
        )

        def res(i, o):
            block = nn.Module()
            block.pre_conv = nn.Sequential(
                nn.BatchNorm2d(i), lrelu, nn.MaxPool2d((1, 2)),
            )
            block.conv = nn.Sequential(
                nn.Conv2d(i, o, 3, padding=1, bias=False),
                nn.BatchNorm2d(o), lrelu,
                nn.Conv2d(o, o, 3, padding=1, bias=False),
            )
            block.conv1by1 = nn.Conv2d(i, o, 1, bias=False)
            return block

        self.res_block1 = res(c0, c1)
        self.res_block2 = res(c1, c2)
        self.res_block3 = res(c2, c3)
        self.pool_block = nn.Sequential(
            nn.BatchNorm2d(c3), lrelu, nn.MaxPool2d((1, 4)),
        )
        self.bilstm_classifier = nn.LSTM(2 * c3, lstm_hidden,
                                         batch_first=True,
                                         bidirectional=True)
        self.classifier = nn.Linear(2 * lstm_hidden, 1)

    def forward(self, mel):  # mel (B, T, bins)
        x = mel[:, None]  # (B, 1, T, bins)
        x = self.conv_block(x)
        for block in (self.res_block1, self.res_block2, self.res_block3):
            pooled = block.pre_conv(x)
            x = block.conv(pooled) + block.conv1by1(pooled)
        x = self.pool_block(x)  # (B, 256, T, 2)
        b, c, t, bins = x.shape
        x = x.permute(0, 2, 1, 3).reshape(b, t, c * bins)
        x, _ = self.bilstm_classifier(x)
        return torch.abs(self.classifier(x)[..., 0])


def gen_jdc():
    from everyvoice_tpu.models.styletts2.jdc import convert_torch_jdc_state

    # Reduced geometry (the full published geometry — channels
    # 64/128/192/256, BiLSTM 512x256 — would make a ~12 MB fixture); the
    # converter layout and every op are identical, only the widths shrink.
    geometry = dict(channels=[8, 12, 16, 24], lstm_hidden=16)
    model = _TorchJDC(channels=tuple(geometry["channels"]),
                      lstm_hidden=geometry["lstm_hidden"]).eval()
    # non-trivial running stats so frozen-BN handling is actually exercised
    with torch.no_grad():
        for module in model.modules():
            if isinstance(module, nn.BatchNorm2d):
                module.running_mean.uniform_(-0.5, 0.5)
                module.running_var.uniform_(0.5, 2.0)
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, 16, 80)).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.from_numpy(mel)).numpy()
    params = convert_torch_jdc_state({"net": model.state_dict()})
    save_fixture("jdc", params, geometry, {"mel": mel}, {"f0": expected})


# ---------------------------------------------------------------------------
# ASR text-aligner — torch mirror of the published ASRCNN
# (module/key layout matches yl4579/AuxiliaryASR models.py)


class _LinearNorm(nn.Module):
    def __init__(self, i, o, bias=True):
        super().__init__()
        self.linear_layer = nn.Linear(i, o, bias=bias)

    def forward(self, x):
        return self.linear_layer(x)


class _ConvNorm(nn.Module):
    def __init__(self, i, o, k, stride=1, padding=0, dilation=1):
        super().__init__()
        self.conv = nn.Conv1d(i, o, k, stride=stride, padding=padding,
                              dilation=dilation)

    def forward(self, x):
        return self.conv(x)


class _TorchASR(nn.Module):
    def __init__(self, input_dim=80, hidden=32, n_token=40, n_layers=2,
                 emb=24):
        super().__init__()
        import math

        n = np.arange(input_dim)[:, None]
        k = np.arange(input_dim // 2)[None, :]
        basis = np.cos(math.pi / input_dim * (n + 0.5) * k)
        basis *= np.where(k == 0, math.sqrt(1 / input_dim),
                          math.sqrt(2 / input_dim))
        self.register_buffer("dct", torch.from_numpy(basis.astype(np.float32)))
        self.init_cnn = _ConvNorm(input_dim // 2, hidden, 7, stride=2,
                                  padding=3)
        self.cnns = nn.ModuleList()
        for _ in range(n_layers):
            block = nn.Module()
            inner = nn.Module()
            inner.blocks = nn.ModuleList()
            for j in range(3):
                d = 3 ** j
                inner.blocks.append(nn.Sequential(
                    _ConvNorm(hidden, hidden, 3, padding=d, dilation=d),
                    nn.ReLU(),
                    nn.GroupNorm(8, hidden),
                    nn.ReLU(),
                    _ConvNorm(hidden, hidden, 3, padding=1),
                ))
            outer_norm = nn.GroupNorm(1, hidden)
            stage = nn.Sequential()
            stage.add_module("0", inner)
            stage.add_module("1", outer_norm)
            self.cnns.append(stage)
        self.projection = _ConvNorm(hidden, hidden // 2, 1)
        self.ctc_linear = nn.Sequential(
            _LinearNorm(hidden // 2, hidden), nn.ReLU(),
            _LinearNorm(hidden, n_token),
        )
        h = hidden // 2
        s2s = nn.Module()
        s2s.embedding = nn.Embedding(n_token, emb)
        s2s.decoder_rnn = nn.LSTMCell(emb + h, h)
        attn = nn.Module()
        attn.query_layer = _LinearNorm(h, h, bias=False)
        attn.memory_layer = _LinearNorm(h, h, bias=False)
        attn.v = _LinearNorm(h, 1, bias=False)
        loc = nn.Module()
        loc.location_conv = _ConvNorm(2, 32, 63, padding=31)
        loc.location_conv.conv = nn.Conv1d(2, 32, 63, padding=31, bias=False)
        loc.location_dense = _LinearNorm(32, h, bias=False)
        attn.location_layer = loc
        s2s.attention_layer = attn
        s2s.project_to_hidden = nn.Sequential(_LinearNorm(2 * h, h))
        s2s.project_to_n_symbols = nn.Linear(h, n_token)
        self.asr_s2s = s2s
        self.hidden = hidden
        self.h = h

    def forward(self, mel, mel_lengths, text, sos_index=1):
        x = mel @ self.dct                        # (B, T, 40)
        x = self.init_cnn(x.transpose(1, 2))      # (B, H, L)
        for stage in self.cnns:
            inner, outer = stage[0], stage[1]
            for block in inner.blocks:
                res = x
                y = block[0](x)
                y = block[1](y)
                y = block[2](y)
                y = block[4](y)
                y = torch.relu(y)
                x = res + y
            x = outer(x)
        memory = self.projection(x).transpose(1, 2)  # (B, L, h)
        ctc = self.ctc_linear[2](
            torch.relu(self.ctc_linear[0](memory))
        )
        down = (mel_lengths + 1) // 2
        valid = torch.arange(memory.shape[1])[None] < down[:, None]
        s2s = self.asr_s2s
        b, length, h = memory.shape
        processed = s2s.attention_layer.memory_layer(memory)
        emb = s2s.embedding(text)
        sos = s2s.embedding.weight[sos_index][None, None].expand(b, 1, -1)
        inputs = torch.cat([sos, emb], dim=1)
        h_t = torch.zeros(b, h)
        c_t = torch.zeros(b, h)
        w = torch.zeros(b, length)
        w_cum = torch.zeros(b, length)
        ctx = torch.zeros(b, h)
        hiddens, logits, attns = [], [], []
        for t in range(inputs.shape[1]):
            cell_in = torch.cat([inputs[:, t], ctx], dim=-1)
            h_t, c_t = s2s.decoder_rnn(cell_in, (h_t, c_t))
            w_cat = torch.stack([w, w_cum], dim=1)  # (B, 2, L)
            loc = s2s.attention_layer.location_layer.location_conv(w_cat)
            loc = s2s.attention_layer.location_layer.location_dense(
                loc.transpose(1, 2)
            )
            q = s2s.attention_layer.query_layer(h_t)[:, None]
            energies = s2s.attention_layer.v(
                torch.tanh(q + loc + processed)
            )[..., 0]
            energies = energies.masked_fill(~valid, -1e9)
            w = torch.softmax(energies, dim=-1)
            w_cum = w_cum + w
            ctx = torch.einsum("bl,blh->bh", w, memory)
            hidden = torch.tanh(
                s2s.project_to_hidden(torch.cat([h_t, ctx], dim=-1))
            )
            hiddens.append(hidden)
            logits.append(s2s.project_to_n_symbols(hidden))
            attns.append(w)
        return (
            ctc,
            torch.stack(logits, dim=1),
            torch.stack(attns, dim=1),
        )


def gen_asr():
    from everyvoice_tpu.models.styletts2.asr import convert_torch_asr_state

    model = _TorchASR().eval()
    geometry = dict(n_token=40, input_dim=80, hidden_dim=32, n_layers=2,
                    token_embedding_dim=24)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((2, 24, 80)).astype(np.float32)
    mel_lengths = np.array([24, 16], np.int64)
    text = np.array([[3, 7, 12, 9], [5, 2, 0, 0]], np.int64)
    with torch.no_grad():
        ctc, s2s_logits, attn = model(
            torch.from_numpy(mel), torch.from_numpy(mel_lengths),
            torch.from_numpy(text),
        )
    params = convert_torch_asr_state(model.state_dict(), n_layers=2)
    save_fixture("asr", params, geometry,
                 {"mel": mel, "mel_lengths": mel_lengths, "text": text},
                 {"ctc": ctc.numpy(), "s2s_logits": s2s_logits.numpy(),
                  "attn": attn.numpy()})


if __name__ == "__main__":
    gen_plbert()
    gen_wavlm()
    gen_wav2vec2()
    gen_asr()
    gen_jdc()
    print("done")

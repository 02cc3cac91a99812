"""Demo server tests: drive the real HTTP surface
(model: reference everyvoice/tests/test_demo.py + the Playwright regression
tests, using urllib against a live server instead of a browser)."""

import json
import threading
import urllib.request

import pytest

from everyvoice_tpu.demo.app import create_demo_app, normalize_text
from model_stubs import (
    get_dummy_fs2_checkpoint,
    get_dummy_hifigan_checkpoint,
)


@pytest.fixture(scope="module")
def demo_server(tmp_path_factory, dummy_ckpts):
    tmp = tmp_path_factory.mktemp("demo")
    fs2 = dummy_ckpts["fs2"]
    gen = dummy_ckpts["generator"]
    denylist = tmp / "denylist.txt"
    denylist.write_text("forbidden\n")
    app = create_demo_app(fs2, gen, denylist=denylist)
    server = app.make_server()
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    yield f"http://{host}:{port}", app
    server.shutdown()


def post_json(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestDemoServer:
    def test_index_page(self, demo_server):
        url, app = demo_server
        with urllib.request.urlopen(url + "/") as resp:
            body = resp.read().decode()
        assert resp.status == 200
        assert "Synthesize" in body
        assert "<select id='language'>" in body.replace('"', "'")

    def test_info_endpoint(self, demo_server):
        url, app = demo_server
        with urllib.request.urlopen(url + "/api/info") as resp:
            info = json.loads(resp.read())
        assert info["model"] == "FastSpeech2"
        assert "default" in info["speakers"]

    def test_successful_synthesis(self, demo_server):
        url, app = demo_server
        status, body = post_json(
            url + "/api/synthesize", {"text": "hello world"}
        )
        assert status == 200, body
        import base64

        wav_bytes = base64.b64decode(body["wav_base64"])
        assert wav_bytes[:4] == b"RIFF"

    def test_empty_text_rejected(self, demo_server):
        url, app = demo_server
        status, body = post_json(url + "/api/synthesize", {"text": "  "})
        assert status == 400
        assert "enter some text" in body["error"]

    def test_denylist_blocks(self, demo_server):
        url, app = demo_server
        status, body = post_json(
            url + "/api/synthesize", {"text": "this is Forbidden speech"}
        )
        assert status == 400
        assert "not allowed" in body["error"]

    def test_denylist_homograph_resistant(self, demo_server):
        url, app = demo_server
        # Fullwidth letters normalize to the plain word via NFKC
        status, body = post_json(
            url + "/api/synthesize", {"text": "ｆｏｒｂｉｄｄｅｎ"}
        )
        assert status == 400


class TestNormalization:
    def test_nfkc_casefold(self):
        assert normalize_text("ＨＥＬＬＯ") == "hello"
        assert normalize_text("Héllo") == "hello"
        assert normalize_text("  a   b  ") == "a b"


@pytest.fixture(scope="module")
def styletts2_server(tmp_path_factory):
    from everyvoice_tpu.demo.app import create_demo_app_auto
    from model_stubs import get_dummy_styletts2_checkpoint

    tmp = tmp_path_factory.mktemp("st2demo")
    ckpt = get_dummy_styletts2_checkpoint(tmp)
    app = create_demo_app_auto(ckpt)  # auto-dispatches on model_info.name
    server = app.make_server()
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    yield f"http://{host}:{port}", app
    server.shutdown()


class TestStyleTTS2Demo:
    def test_auto_dispatch_and_synthesis(self, styletts2_server):
        url, app = styletts2_server
        status, body = post_json(
            url + "/api/synthesize",
            {"text": "hello world", "diffusion_steps": 2},
        )
        assert status == 200, body
        import base64

        assert base64.b64decode(body["wav_base64"])[:4] == b"RIFF"

    def test_slider_page(self, styletts2_server):
        url, app = styletts2_server
        with urllib.request.urlopen(url + "/") as resp:
            page = resp.read().decode()
        assert "Diffusion steps" in page


class TestRestrictionsAndOutputs:
    """Reference demo flags: -s/-l restrict the dropdowns, -O restricts the
    served output formats, and every synthesis also writes the selected
    formats into --output-dir (reference cli.py:934-1010, demo/app.py:770)."""

    def test_unknown_speaker_restriction_rejected(self, dummy_ckpts):
        with pytest.raises(ValueError, match="speakers not in the model"):
            create_demo_app(
                dummy_ckpts["fs2"], dummy_ckpts["generator"],
                speakers=["nobody"],
            )

    def test_unknown_format_rejected(self, dummy_ckpts):
        with pytest.raises(ValueError, match="output formats"):
            create_demo_app(
                dummy_ckpts["fs2"], dummy_ckpts["generator"],
                output_formats=["mp3"],
            )

    def test_format_restriction_and_file_outputs(self, dummy_ckpts, tmp_path):
        app = create_demo_app(
            dummy_ckpts["fs2"], dummy_ckpts["generator"],
            output_formats=["wav", "textgrid"], output_dir=tmp_path / "out",
        )
        page = app.render_page()
        assert "value='textgrid'" in page and "value='spec'" not in page
        # a request for an unserved format is refused
        code, body = app.synthesize_api(
            {"text": "hello", "output_formats": ["spec"]}
        )
        assert code == 400 and "spec" in body["error"]
        code, body = app.synthesize_api(
            {"text": "hello world", "output_formats": ["wav", "textgrid"]}
        )
        assert code == 200
        files = [str(f) for f in body["files"]]
        assert any(f.endswith(".TextGrid") for f in files)
        assert any(f.endswith(".wav") for f in files)
        for f in files:
            assert (tmp_path / "out") in __import__("pathlib").Path(f).parents

    def test_ref_speaker_parsing(self, tmp_path):
        from everyvoice_tpu.demo.app import parse_ref_speakers

        wav = tmp_path / "eric.wav"
        wav.write_bytes(b"RIFF")
        assert parse_ref_speakers([f"Eric={wav}"]) == {"Eric": wav}
        with pytest.raises(ValueError, match="must look like"):
            parse_ref_speakers(["no-separator"])
        with pytest.raises(ValueError, match="not found"):
            parse_ref_speakers([f"X={tmp_path}/missing.wav"])
        with pytest.raises(ValueError, match="twice"):
            parse_ref_speakers([f"Eric={wav}", f"Eric={wav}"])


class TestPageContract:
    """No browser runs in this image (the reference drives its demo with
    Playwright, tests/regression/test-demo-app-lj-full.py), so pin statically
    what a browser would exercise: every element id the inline script reads
    exists in the HTML, every control on the page feeds the request body,
    and every field the script sends is one `synthesize_api` consumes."""

    @staticmethod
    def _contract(page: str, api_source: str):
        import re

        read_ids = set(re.findall(r"getElementById\(\s*['\"]([\w-]+)['\"]", page))
        declared_ids = set(re.findall(r"id=['\"]([\w-]+)['\"]", page))
        missing = read_ids - declared_ids
        assert not missing, f"JS reads elements that don't exist: {missing}"

        # Decorative-control check: every range input's value must be read
        # by the script (this is how the StyleTTS2 sliders once went dead).
        sliders = set(re.findall(r"type=['\"]range['\"] id=['\"]([\w-]+)['\"]", page))
        dead = {s for s in sliders if s not in read_ids}
        assert not dead, f"sliders whose value never reaches the JS: {dead}"

        # Every body field the page posts must be consumed by the API.
        sent = set(re.findall(r"body\.(\w+)\s*=", page))
        sent |= set(re.findall(r"(\w+):\s*document\.getElementById", page))
        consumed = set(re.findall(r"payload\.get\(\s*['\"](\w+)['\"]", api_source))
        unknown = sent - consumed
        assert not unknown, f"page posts fields the API ignores: {unknown}"

    def test_fs2_page(self, demo_server):
        import inspect

        from everyvoice_tpu.demo.app import DemoApp

        url, app = demo_server
        with urllib.request.urlopen(url + "/") as resp:
            page = resp.read().decode()
        self._contract(page, inspect.getsource(DemoApp.synthesize_api))

    def test_styletts2_page(self, styletts2_server):
        import inspect

        from everyvoice_tpu.demo.app import StyleTTS2DemoApp

        url, app = styletts2_server
        with urllib.request.urlopen(url + "/") as resp:
            page = resp.read().decode()
        self._contract(page, inspect.getsource(StyleTTS2DemoApp.synthesize_api))
        for field in ("diffusion_steps", "embedding_scale",
                      "acoustic_blend", "prosody_blend"):
            assert f"body.{field}" in page


@pytest.mark.slow
class TestDemoSubprocess:
    """The reference drives its live demo with Playwright
    (tests/regression/test-demo-app-lj-full.py:17-52): denylist rejection,
    empty-text error, and a successful synthesis — here against the real
    `everyvoice-tpu demo` CLI running in a separate OS process, over real
    HTTP (everything a browser does except rendering)."""

    def test_cli_demo_end_to_end(self, tmp_path):
        import base64
        import socket
        import subprocess
        import sys
        import time

        fs2 = get_dummy_fs2_checkpoint(tmp_path)
        gen = get_dummy_hifigan_checkpoint(tmp_path, generator_only=True)
        denylist = tmp_path / "denylist.txt"
        denylist.write_text("forbidden\n")
        with socket.socket() as sock:
            sock.bind(("127.0.0.1", 0))
            port = sock.getsockname()[1]
        import os

        env = dict(os.environ, EVERYVOICE_DEVICE="cpu")
        proc = subprocess.Popen(
            [
                sys.executable, "-m", "everyvoice_tpu", "demo", str(fs2),
                "--vocoder-path", str(gen), "--port", str(port),
                "--server-name", "127.0.0.1", "--denylist", str(denylist),
            ],
            env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        base = f"http://127.0.0.1:{port}"
        try:
            deadline = time.monotonic() + 120
            last_err = None
            while time.monotonic() < deadline:
                if proc.poll() is not None:
                    raise AssertionError(
                        f"demo exited early:\n{proc.stdout.read()[-3000:]}"
                    )
                try:
                    with urllib.request.urlopen(base + "/", timeout=5) as r:
                        assert r.status == 200
                    break
                except OSError as e:
                    last_err = e
                    time.sleep(1.0)
            else:
                raise AssertionError(f"demo never came up: {last_err}")

            status, body = post_json(base + "/api/synthesize", {"text": " "})
            assert status == 400 and "enter some text" in body["error"]

            status, body = post_json(
                base + "/api/synthesize", {"text": "totally forbidden words"}
            )
            assert status == 400 and "not allowed" in body["error"]

            status, body = post_json(
                base + "/api/synthesize", {"text": "hello world"}
            )
            assert status == 200, body
            wav = base64.b64decode(body["wav_base64"])
            assert wav[:4] == b"RIFF" and len(wav) > 100  # untrained model -> short
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                proc.kill()


class TestUIConfig:
    """UI-label JSON overrides (reference demo/app.py load_app_ui_labels):
    rename page strings and restrict/rename dropdown entries."""

    def test_labels_and_restrictions(self, tmp_path):
        fs2 = get_dummy_fs2_checkpoint(tmp_path)
        gen = get_dummy_hifigan_checkpoint(tmp_path, generator_only=True)
        app = create_demo_app(
            fs2, gen,
            ui_labels={
                "title": "Ma Démo",
                "speakers": {"default": "Narrator"},
                "languages": {"default": "Undetermined"},
            },
        )
        page = app.render_page()
        assert "Ma Démo" in page
        assert "Narrator" in page
        # form values stay the model's values
        assert "value='default'" in page.replace('"', "'")

    def test_unknown_speaker_rejected(self, tmp_path):
        fs2 = get_dummy_fs2_checkpoint(tmp_path)
        gen = get_dummy_hifigan_checkpoint(tmp_path, generator_only=True)
        with pytest.raises(ValueError, match="not trained"):
            create_demo_app(
                fs2, gen, ui_labels={"speakers": {"nobody": "Nobody"}}
            )

    def test_api_rejects_unserved_language(self, tmp_path):
        fs2 = get_dummy_fs2_checkpoint(tmp_path)
        gen = get_dummy_hifigan_checkpoint(tmp_path, generator_only=True)
        app = create_demo_app(fs2, gen)
        status, body = app.synthesize_api(
            {"text": "hello", "language": "klingon"}
        )
        assert status == 400 and "not served" in body["error"]


class TestDemoDispatch:
    """Model-type dispatch guards (reference test_demo.py dispatch tests)."""

    def test_vocoder_checkpoint_as_primary_rejected(self, tmp_path):
        from everyvoice_tpu.demo.app import create_demo_app_auto

        gen = get_dummy_hifigan_checkpoint(tmp_path, generator_only=True)
        with pytest.raises(ValueError, match="bare vocoder"):
            create_demo_app_auto(gen)

    def test_fs2_requires_vocoder(self, tmp_path):
        from everyvoice_tpu.demo.app import create_demo_app_auto

        fs2 = get_dummy_fs2_checkpoint(tmp_path)
        with pytest.raises(ValueError, match="vocoder"):
            create_demo_app_auto(fs2)

    def test_fs2_rejects_ref_audio_dir(self, tmp_path):
        from everyvoice_tpu.demo.app import create_demo_app_auto

        fs2 = get_dummy_fs2_checkpoint(tmp_path)
        gen = get_dummy_hifigan_checkpoint(tmp_path, generator_only=True)
        with pytest.raises(ValueError, match="ref-audio-dir"):
            create_demo_app_auto(fs2, vocoder_path=gen, ref_audio_dir=tmp_path)

    def test_malformed_ui_config_is_clean_error(self, tmp_path):
        from click.testing import CliRunner

        from everyvoice_tpu.cli import main

        bad = tmp_path / "ui.json"
        bad.write_text("{not json")
        fs2 = get_dummy_fs2_checkpoint(tmp_path)
        result = CliRunner().invoke(
            main, ["demo", str(fs2), "--ui-config", str(bad)]
        )
        assert result.exit_code != 0
        assert "not valid JSON" in result.output


@pytest.fixture(scope="module")
def allowlist_server(tmp_path_factory, dummy_ckpts):
    tmp = tmp_path_factory.mktemp("demo_allow")
    fs2 = dummy_ckpts["fs2"]
    gen = dummy_ckpts["generator"]
    allowlist = tmp / "allowlist.txt"
    allowlist.write_text("hello\nworld\n")
    app = create_demo_app(fs2, gen, allowlist=allowlist)
    server = app.make_server()
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    yield f"http://{host}:{port}", app
    server.shutdown()


class TestAllowlist:
    """Reference demo/app.py allowlist mode: only whitelisted words pass."""

    def test_allowed_words_synthesize(self, allowlist_server):
        base, _ = allowlist_server
        status, body = post_json(
            f"{base}/api/synthesize",
            {"text": "hello world", "language": "default",
             "speaker": "default"},
        )
        assert status == 200, body

    def test_unlisted_word_rejected(self, allowlist_server):
        base, _ = allowlist_server
        status, body = post_json(
            f"{base}/api/synthesize",
            {"text": "hello stranger", "language": "default",
             "speaker": "default"},
        )
        assert status == 400
        assert "allow" in json.dumps(body).lower()

    def test_homograph_evasion_blocked(self, allowlist_server):
        # Cyrillic 'о' in "hellо" must not slip past the allowlist.
        base, _ = allowlist_server
        status, _ = post_json(
            f"{base}/api/synthesize",
            {"text": "hellо", "language": "default",
             "speaker": "default"},
        )
        assert status == 400

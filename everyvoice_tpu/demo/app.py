"""Interactive synthesis demo server
(role parity: everyvoice/demo/app.py — the Gradio Blocks app; rebuilt on the
stdlib HTTP server since gradio is not available, with the same features:
text + duration-control + language/speaker selection + output format,
allow/denylist with homograph-resistant normalization, UI-label overrides).
"""

from __future__ import annotations

import base64
import io
import json
import re
import unicodedata
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional

from everyvoice_tpu.logger import logger


def normalize_text(text: str) -> str:
    """Homograph-resistant normalization for allow/denylist comparison
    (reference demo/app.py:133-173): NFKC fold + casefold + strip marks and
    whitespace so visually-identical strings compare equal."""
    text = unicodedata.normalize("NFKC", text)
    text = "".join(
        ch for ch in unicodedata.normalize("NFD", text)
        if unicodedata.category(ch) != "Mn"
    )
    text = text.casefold()
    return re.sub(r"\s+", " ", text).strip()


def load_wordlist(path: Optional[Path]) -> set:
    if path is None:
        return set()
    lines = Path(path).read_text(encoding="utf8").splitlines()
    return {normalize_text(line) for line in lines if line.strip()}


PAGE_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>{title}</title>
<style>
 body {{ font-family: sans-serif; max-width: 48rem; margin: 2rem auto; }}
 textarea {{ width: 100%; height: 6rem; }}
 .row {{ margin: 0.75rem 0; }}
 #error {{ color: #b00020; }}
 button {{ padding: 0.5rem 1.5rem; }}
</style>
</head>
<body>
<h1>{title}</h1>
<p>{subtitle}</p>
<div class="row"><textarea id="text" placeholder="{text_placeholder}"></textarea></div>
<div class="row">Language:
  <select id="language">{language_options}</select>
  &nbsp; Speaker: <select id="speaker">{speaker_options}</select>
</div>
<div class="row">Duration multiplier:
  <input type="range" id="duration" min="0.5" max="2.0" step="0.05" value="1.0"
   oninput="document.getElementById('durval').innerText = this.value">
  <span id="durval">1.0</span>
</div>
<div class="row"><button id="synthesize" onclick="synthesize()">Synthesize</button></div>
<div class="row" id="error"></div>
<div class="row"><audio id="player" controls></audio></div>
<script>
async function synthesize() {{
  const error = document.getElementById('error');
  error.innerText = '';
  const body = {{
    text: document.getElementById('text').value,
    language: document.getElementById('language').value,
    speaker: document.getElementById('speaker').value,
    duration_control: parseFloat(document.getElementById('duration').value),
  }};
  const resp = await fetch('/api/synthesize', {{
    method: 'POST', headers: {{'Content-Type': 'application/json'}},
    body: JSON.stringify(body),
  }});
  const data = await resp.json();
  if (!resp.ok) {{ error.innerText = data.error || 'Synthesis failed'; return; }}
  const player = document.getElementById('player');
  player.src = 'data:audio/wav;base64,' + data.wav_base64;
  player.play();
}}
</script>
</body>
</html>
"""


class DemoApp:
    """Holds the loaded models and serves the UI + JSON API."""

    def __init__(
        self,
        fs2_checkpoint: Path | str,
        vocoder_checkpoint: Optional[Path | str] = None,
        allowlist: Optional[Path] = None,
        denylist: Optional[Path] = None,
        ui_labels: Optional[dict] = None,
    ):
        from everyvoice_tpu.models.fs2.synthesize import Synthesizer

        self.synthesizer = Synthesizer(fs2_checkpoint, vocoder_checkpoint)
        if self.synthesizer.vocoder is None:
            raise ValueError("The demo requires a vocoder checkpoint for wav output")
        self.allowlist = load_wordlist(allowlist)
        self.denylist = load_wordlist(denylist)
        self.ui = {
            "title": "EveryVoice TPU Demo",
            "subtitle": "Type a sentence and press Synthesize.",
            "text_placeholder": "Hello world",
        }
        if ui_labels:
            self.ui.update(ui_labels)
        self.languages = sorted(self.synthesizer.lang2id) or ["default"]
        self.speakers = sorted(self.synthesizer.speaker2id) or ["default"]

    # -- request handling --------------------------------------------------
    def check_lists(self, text: str) -> Optional[str]:
        normalized = normalize_text(text)
        if self.denylist:
            for entry in self.denylist:
                if entry and entry in normalized:
                    return "Oops, that word is not allowed to be synthesized."
        if self.allowlist:
            words = set(normalized.split())
            if not words <= self.allowlist:
                return "Sorry, one or more words are not in the allowed list."
        return None

    def synthesize_api(self, payload: dict) -> tuple:
        text = (payload.get("text") or "").strip()
        if not text:
            return 400, {"error": "Please enter some text to synthesize."}
        refusal = self.check_lists(text)
        if refusal:
            return 400, {"error": refusal}
        language = payload.get("language") or self.languages[0]
        speaker = payload.get("speaker") or self.speakers[0]
        duration = float(payload.get("duration_control", 1.0))
        results = self.synthesizer.synthesize(
            [text], language=language, speaker=speaker, duration_control=duration,
        )
        if not results or results[0]["wav"] is None:
            return 400, {"error": "No valid symbols found in the input text."}
        import numpy as np

        from everyvoice_tpu.dsp.audio_io import write_wav

        buf = io.BytesIO()
        # write to a temp path because the wave module needs a seekable file
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
            sr = self.synthesizer.config.preprocessing.audio.output_sampling_rate
            write_wav(tmp.name, np.asarray(results[0]["wav"]), sr)
            buf.write(Path(tmp.name).read_bytes())
        return 200, {"wav_base64": base64.b64encode(buf.getvalue()).decode("ascii")}

    def render_page(self) -> str:
        def options(values):
            return "".join(f"<option value='{v}'>{v}</option>" for v in values)

        return PAGE_TEMPLATE.format(
            title=self.ui["title"],
            subtitle=self.ui["subtitle"],
            text_placeholder=self.ui["text_placeholder"],
            language_options=options(self.languages),
            speaker_options=options(self.speakers),
        )

    # -- server -------------------------------------------------------------
    def make_handler(self):
        app = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                logger.debug("demo: " + fmt % args)

            def _send(self, code: int, body: bytes, content_type: str):
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    self._send(
                        200, app.render_page().encode("utf8"),
                        "text/html; charset=utf-8",
                    )
                elif self.path == "/api/info":
                    info = {
                        "languages": app.languages,
                        "speakers": app.speakers,
                        "model": "FastSpeech2",
                    }
                    self._send(200, json.dumps(info).encode(), "application/json")
                else:
                    self._send(404, b"not found", "text/plain")

            def do_POST(self):
                if self.path != "/api/synthesize":
                    self._send(404, b"not found", "text/plain")
                    return
                length = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    code, body = app.synthesize_api(payload)
                except Exception as e:  # surface errors to the client
                    logger.error(f"demo synthesis error: {e}")
                    code, body = 500, {"error": str(e)}
                self._send(code, json.dumps(body).encode(), "application/json")

        return Handler

    def serve(self, host: str = "0.0.0.0", port: int = 7860):
        server = ThreadingHTTPServer((host, port), self.make_handler())
        server.serve_forever()

    def make_server(self, host: str = "127.0.0.1", port: int = 0):
        """Non-blocking server for tests; returns the server object."""
        return ThreadingHTTPServer((host, port), self.make_handler())


def create_demo_app(
    fs2_checkpoint, vocoder_checkpoint=None, allowlist=None, denylist=None,
    ui_labels=None,
) -> DemoApp:
    return DemoApp(
        fs2_checkpoint, vocoder_checkpoint, allowlist=allowlist,
        denylist=denylist, ui_labels=ui_labels,
    )

"""TTS demo web app (stdlib HTTP — runs anywhere).

Capability parity with the reference streamlit demo
(app/streamlit/tts_demo.py:46): language/speaker pickers, text box, composes
TTSEvaluationInterface -> VocoderEvaluationInterface and returns a WAV. A
streamlit variant lives in app/streamlit_demo.py for environments that have
streamlit installed; this stdlib server is the dependency-free equivalent.

  python app/demo_server.py --tts_ckpt <dir> --vocoder_ckpt <dir> [--port 7860]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PAGE = """<!DOCTYPE html>
<html><head><title>speechflow-tpu demo</title>
<style>body{{font-family:sans-serif;max-width:640px;margin:40px auto}}
textarea{{width:100%;height:80px}}select,button{{margin:4px 0;padding:6px}}</style>
</head><body>
<h2>speechflow-tpu &mdash; TTS demo</h2>
<form action="/synthesize" method="get">
<label>Language</label> <select name="lang">{langs}</select>
<label>Speaker</label> <select name="speaker">{speakers}</select><br/>
<textarea name="text">Hello world. This is the TPU-native speech framework!</textarea><br/>
<button type="submit">Synthesize</button>
</form>
</body></html>"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tts_ckpt", required=True)
    p.add_argument("--vocoder_ckpt", required=True)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from speechflow_tpu.interface import (
        TTSEvaluationInterface,
        TTSOptions,
        VocoderEvaluationInterface,
    )

    tts = TTSEvaluationInterface(args.tts_ckpt)
    voc = VocoderEvaluationInterface(args.vocoder_ckpt)
    langs = tts.get_languages() or ["EN"]
    speakers = tts.get_speakers() or ["default"]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            if url.path == "/":
                body = PAGE.format(
                    langs="".join(f"<option>{l}</option>" for l in langs),
                    speakers="".join(f"<option>{s}</option>" for s in speakers),
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/synthesize":
                q = urllib.parse.parse_qs(url.query)
                text = q.get("text", ["Hello"])[0]
                lang = q.get("lang", [langs[0]])[0]
                speaker = q.get("speaker", [speakers[0]])[0]
                out = tts.synthesize(text, lang=lang, speaker=speaker,
                                     opts=TTSOptions(t_out=512))
                import numpy as np

                mels = out.after_postnet_spectrogram
                lens = np.asarray(out.spectrogram_lengths)
                wavs = []
                for i in range(mels.shape[0]):
                    audio = voc.synthesize(np.asarray(mels[i][: int(lens[i])]))
                    wavs.append(audio.waveform)
                full = np.concatenate(wavs)
                from speechflow_tpu.io import AudioChunk

                blob = AudioChunk(data=full, sr=voc.sample_rate).to_bytes()
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)
            elif url.path == "/info":
                body = json.dumps({"languages": langs, "speakers": speakers}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

    srv = HTTPServer(("127.0.0.1", args.port), Handler)
    print(f"demo at http://127.0.0.1:{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()

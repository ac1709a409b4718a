"""Cloud ASR services for long-audio dataset transcription.

Capability parity with the reference's ``annotator/asr_services`` package
(``cloud_asr.py:30`` CloudASR, ``yandex_asr.py:39`` YandexASR,
``google_asr.py:17`` GoogleASR): submit an audio file to a cloud
speech-to-text service's long-running-recognize API, poll the operation,
back off on request-limit responses, and materialize the transcription as a
``.json`` sidecar (+ ``.txt`` timeline, + the annotator's ``.whisper``
word-timestamp contract) next to the audio file.

Zero-egress design: each service is a pure *request builder* — it produces
the HTTP method/url/headers/body for submit and poll and parses the raw
response dicts — and executes through an injected ``transport`` callable.
In this environment (and in CI) the transport is a fake; against a real
deployment the user passes ``http_transport`` (stdlib urllib, no extra
deps).  This keeps the full operation lifecycle — limit/backoff, polling,
chunk parsing, sidecar emission — contract-tested without network access,
which the reference cannot do (its services import boto3/google.cloud at
call time and are untestable offline).
"""

from __future__ import annotations

import json
import logging
import time
import typing as tp
from dataclasses import dataclass, field
from datetime import datetime, timezone
from pathlib import Path

import numpy as np

from speechflow_tpu.annotator.asr import ASRBase
from speechflow_tpu.io import AudioChunk

__all__ = [
    "ASRException",
    "ASRRequestLimitException",
    "CloudASR",
    "YandexSTTService",
    "GoogleSTTService",
    "http_transport",
    "run_cloud_transcription",
]

LOGGER = logging.getLogger("speechflow_tpu")

#: transport(method, url, headers, payload) -> response dict.  ``payload`` is
#: a JSON-serializable dict for API calls or raw ``bytes`` for media upload.
Transport = tp.Callable[[str, str, tp.Mapping[str, str], tp.Any], dict]


class ASRException(Exception):
    """Service returned an unrecoverable error (reference cloud_asr.py:22)."""


class ASRRequestLimitException(ASRException):
    """Request/quota limit hit (reference cloud_asr.py:26)."""


def http_transport(method: str, url: str, headers: tp.Mapping[str, str],
                   payload: tp.Any, timeout: float = 60.0) -> dict:
    """Stdlib transport for real deployments: JSON in, JSON out."""
    import urllib.request

    data = payload if isinstance(payload, (bytes, bytearray)) else (
        json.dumps(payload).encode() if payload is not None else None)
    req = urllib.request.Request(url, data=data, method=method,
                                 headers=dict(headers))
    if data is not None and not isinstance(payload, (bytes, bytearray)):
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


# --------------------------------------------------------------------------- #
#  service request builders                                                    #
# --------------------------------------------------------------------------- #


@dataclass
class STTService:
    """One cloud STT dialect: how to submit audio, poll, and parse results.

    ``credentials`` comes from a user yml/json file (reference
    yandex_asr.py:54-66 loads api_key/bucket the same way)."""

    credentials: tp.Mapping[str, tp.Any]
    locale_code: str = "en-US"
    sample_rate: int = 16000

    def submit(self, transport: Transport, audio_pcm16: bytes,
               audio_name: str) -> str:
        """Upload + start recognition; return an operation id."""
        raise NotImplementedError

    def poll(self, transport: Transport, op_id: str) -> dict:
        """One poll.  -> {"done": bool} | {"limit": msg} | {"error": msg};
        when done also {"text": str, "timestamps": [[word, b, e], ...]}."""
        raise NotImplementedError

    @classmethod
    def from_credentials_file(cls, path: tp.Union[str, Path], **kwargs):
        path = Path(path)
        if path.suffix in (".yml", ".yaml"):
            import yaml

            creds = yaml.safe_load(path.read_text(encoding="utf-8"))
        else:
            creds = json.loads(path.read_text(encoding="utf-8"))
        return cls(credentials=creds, **kwargs)


@dataclass
class YandexSTTService(STTService):
    """SpeechKit v2 longRunningRecognize dialect (reference yandex_asr.py:71-80:
    POST stt/v2/longRunningRecognize with an object-storage URI, then GET
    operations/{id} until done; word times arrive as "1.23s" strings)."""

    endpoint: str = "https://transcribe.api.cloud.yandex.net/speech/stt/v2"
    operations: str = "https://operation.api.cloud.yandex.net/operations"
    #: media upload target (object storage in the reference; any presigned
    #: PUT endpoint here)
    upload_url: str = ""

    def _headers(self) -> dict:
        return {"Authorization": f"Api-Key {self.credentials['api_key']}"}

    def submit(self, transport: Transport, audio_pcm16: bytes,
               audio_name: str) -> str:
        up = self.upload_url or self.credentials.get("upload_url", "")
        uri = transport("PUT", f"{up}/{audio_name}", self._headers(),
                        audio_pcm16).get("uri", f"{up}/{audio_name}")
        body = {
            "config": {"specification": {
                "languageCode": self.locale_code,
                # we upload raw int16 PCM; SpeechKit defaults to OGG_OPUS, so
                # the encoding must be stated or decode fails server-side
                "audioEncoding": "LINEAR16_PCM",
                "sampleRateHertz": self.sample_rate,
                "rawResults": True,
            }},
            "audio": {"uri": uri},
        }
        resp = transport("POST", f"{self.endpoint}/longRunningRecognize",
                         self._headers(), body)
        if "id" not in resp:
            msg = resp.get("message", str(resp))
            if "limit" in msg.lower():
                raise ASRRequestLimitException(msg)
            raise ASRException(msg)
        return str(resp["id"])

    def poll(self, transport: Transport, op_id: str) -> dict:
        resp = transport("GET", f"{self.operations}/{op_id}",
                         self._headers(), None)
        msg = resp.get("message", "")
        if "limit" in msg.lower():
            return {"done": False, "limit": msg}
        if resp.get("code") == 13 or "error" in resp:
            return {"done": True, "error": resp.get("error", msg)}
        if not resp.get("done"):
            return {"done": False}
        chunks = resp.get("response", {}).get("chunks")
        if not chunks:
            return {"done": True,
                    "error": "Speech in the audio file is not recognized!"}
        words, stamps = [], []
        for chunk in chunks:
            alt = chunk["alternatives"][0]
            for w in alt.get("words", []):
                words.append(w["word"])
                stamps.append([w["word"],
                               float(str(w["startTime"]).rstrip("s")),
                               float(str(w["endTime"]).rstrip("s"))])
        return {"done": True, "text": " ".join(words), "timestamps": stamps}


@dataclass
class GoogleSTTService(STTService):
    """Cloud Speech v1 longrunningrecognize dialect (reference
    google_asr.py:58-117: LINEAR16 + enable_word_time_offsets, words carry
    start_time/end_time seconds)."""

    endpoint: str = "https://speech.googleapis.com/v1"
    upload_url: str = ""

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {self.credentials['token']}"}

    def submit(self, transport: Transport, audio_pcm16: bytes,
               audio_name: str) -> str:
        up = self.upload_url or self.credentials.get("upload_url", "")
        uri = transport("PUT", f"{up}/{audio_name}", self._headers(),
                        audio_pcm16).get("uri", f"{up}/{audio_name}")
        body = {
            "config": {
                "encoding": "LINEAR16",
                "sampleRateHertz": self.sample_rate,
                "languageCode": self.locale_code,
                "enableWordTimeOffsets": True,
            },
            "audio": {"uri": uri},
        }
        resp = transport("POST", f"{self.endpoint}/speech:longrunningrecognize",
                         self._headers(), body)
        if "name" not in resp:
            err = resp.get("error", str(resp))
            msg = err.get("message", str(err)) if isinstance(err, dict) else str(err)
            if "quota" in msg.lower() or "limit" in msg.lower():
                raise ASRRequestLimitException(msg)
            raise ASRException(msg)
        return str(resp["name"])

    def poll(self, transport: Transport, op_id: str) -> dict:
        resp = transport("GET", f"{self.endpoint}/operations/{op_id}",
                         self._headers(), None)
        if resp.get("error"):
            err = resp["error"]
            msg = err.get("message", str(err)) if isinstance(err, dict) else str(err)
            if "quota" in msg.lower() or "limit" in msg.lower():
                return {"done": False, "limit": msg}
            return {"done": True, "error": msg}
        if not resp.get("done"):
            return {"done": False}
        results = resp.get("response", {}).get("results")
        if not results:
            return {"done": True,
                    "error": "Speech in the audio file is not recognized!"}
        words, stamps = [], []
        for res in results:
            for w in res["alternatives"][0].get("words", []):
                words.append(w["word"])
                stamps.append([w["word"],
                               float(str(w["startTime"]).rstrip("s")),
                               float(str(w["endTime"]).rstrip("s"))])
        return {"done": True, "text": " ".join(words), "timestamps": stamps}


# --------------------------------------------------------------------------- #
#  the driver                                                                  #
# --------------------------------------------------------------------------- #


@dataclass
class CloudASR(ASRBase):
    """Long-audio transcription through a cloud STT service.

    Lifecycle per file (reference cloud_asr.py:54-84 converter):
      load -> resample to the service rate -> int16 PCM -> submit -> poll
      (with limit backoff) -> write ``<audio>.json`` (+ ``.txt`` if absent,
      + ``.whisper`` for the annotator pipeline).

    ``sleep_func`` / ``poll_interval_s`` are injectable so the backoff
    behavior is testable without wall-clock (reference _sleep: 600 s)."""

    service: STTService
    transport: Transport = http_transport
    raise_on_asr_limit_exc: bool = False
    poll_interval_s: float = 5.0
    limit_sleep_s: float = 600.0
    max_limit_retries: int = 4
    max_polls: int = 720
    sleep_func: tp.Callable[[float], None] = time.sleep
    output_file_ext: str = ".json"
    write_whisper: bool = True
    _counter: int = field(default=0, repr=False)

    # -- ASRBase contract ---------------------------------------------------------

    def transcribe(self, audio: AudioChunk) -> dict:
        sr = self.service.sample_rate
        chunk = audio if audio.sr == sr else audio.copy().resample(sr)
        wav = np.asarray(chunk.waveform, np.float32)
        pcm16 = (np.clip(wav, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
        self._counter += 1
        name = f"{Path(audio.file_path or 'audio').stem}_{self._counter}.pcm"

        op_id = self._submit_with_backoff(pcm16, name)
        for _ in range(self.max_polls):
            status = self.service.poll(self.transport, op_id)
            if "limit" in status:
                self._limit(status["limit"])
                continue
            if status.get("done"):
                if "error" in status:
                    raise ASRException(status["error"])
                return {"text": status["text"],
                        "timestamps": status["timestamps"]}
            self.sleep_func(self.poll_interval_s)
        raise ASRException(f"operation {op_id} did not finish "
                           f"within {self.max_polls} polls")

    # -- helpers ------------------------------------------------------------------

    def _limit(self, msg: str) -> None:
        if self.raise_on_asr_limit_exc:
            raise ASRRequestLimitException(msg)
        LOGGER.warning("%s - sleep...", msg)
        self.sleep_func(self.limit_sleep_s)

    def _submit_with_backoff(self, pcm16: bytes, name: str) -> str:
        for _ in range(self.max_limit_retries + 1):
            try:
                return self.service.submit(self.transport, pcm16, name)
            except ASRRequestLimitException as e:
                self._limit(str(e))
        raise ASRException("request limit persisted across "
                           f"{self.max_limit_retries} retries")

    # -- file driver (reference converter/json sidecars) ---------------------------

    def process_file(self, path: tp.Union[str, Path],
                     overwrite: bool = False) -> dict:
        path = Path(path)
        out_path = path.with_suffix(self.output_file_ext)
        if out_path.exists() and not overwrite:
            return json.loads(out_path.read_text(encoding="utf-8"))

        result = self(path)
        result.update({
            "api": type(self.service).__name__,
            "locale_code": self.service.locale_code,
            "date": datetime.now(timezone.utc).strftime("%d/%m/%Y %H:%M:%S"),
        })
        out_path.write_text(json.dumps(result, ensure_ascii=False, indent=4),
                            encoding="utf-8")
        txt = path.with_suffix(".txt")
        if not txt.exists():
            txt.write_text(result["text"], encoding="utf-8")
        if self.write_whisper:  # the annotator pipeline's step-0 contract
            path.with_suffix(".whisper").write_text(
                json.dumps({"text": result["text"],
                            "timestamps": result["timestamps"]},
                           ensure_ascii=False, indent=2),
                encoding="utf-8")
        return result

    @classmethod
    def json_to_txt(cls, json_path: tp.Union[str, Path],
                    gap_s: float = 1.0) -> Path:
        """Rewrite a transcription .json as a begin:end<TAB>text timeline
        (reference cloud_asr.py:87 json_to_txt / yandex _to_text).

        The reference emits one line per recognized chunk; chunk structure
        isn't persisted in the sidecar, so segments are reconstructed by
        splitting on inter-word silences > ``gap_s`` — internal boundaries
        of long multi-chunk audio are preserved instead of collapsing the
        whole transcript into a single first-to-last line."""
        json_path = Path(json_path)
        data = json.loads(json_path.read_text(encoding="utf-8"))
        stamps = data.get("timestamps") or []
        lines = []
        if stamps:
            def hms(sec: float) -> str:
                sec = int(sec)
                return f"{sec // 3600}:{(sec % 3600) // 60:02d}:{sec % 60:02d}"

            segments: tp.List[tp.List[list]] = [[stamps[0]]]
            for prev, cur in zip(stamps, stamps[1:]):
                if float(cur[1]) - float(prev[2]) > gap_s:
                    segments.append([])
                segments[-1].append(cur)
            for seg in segments:
                text = " ".join(str(w[0]) for w in seg)
                lines.append(f"{hms(float(seg[0][1]))}:"
                             f"{hms(float(seg[-1][2]))}\t{text}\n")
        out = json_path.with_suffix(".txt")
        out.write_text("".join(lines) or data.get("text", ""),
                       encoding="utf-8")
        return out


def run_cloud_transcription(
    data_root: tp.Union[str, Path],
    asr: CloudASR,
    ext: str = ".wav",
    overwrite: bool = False,
) -> int:
    """Transcribe every ``ext`` file under ``data_root``; returns count.
    Rate-limit failures on one file don't abort the sweep unless the ASR is
    configured to raise (reference cloud_asr raise_on_asr_limit_exc)."""
    from speechflow_tpu.io import construct_file_list

    done = 0
    for f in construct_file_list(data_root, ext=ext):
        try:
            asr.process_file(f, overwrite=overwrite)
            done += 1
        except ASRRequestLimitException:
            raise
        except ASRException as e:
            LOGGER.error("%s: %s", f, e)
    return done

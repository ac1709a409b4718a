"""Contract tests for the cloud ASR service layer (reference
annotator/asr_services: cloud_asr.py:30, yandex_asr.py:39, google_asr.py:17).

A fake transport plays the cloud side of the longRunningRecognize lifecycle —
upload, submit, poll-pending, rate-limit, word-timestamped completion — so the
full driver behavior (backoff, sidecar emission, whisper contract, error
paths) is verified without network access.
"""

import json

import numpy as np
import pytest

from speechflow_tpu.annotator.cloud_asr import (
    ASRException,
    ASRRequestLimitException,
    CloudASR,
    GoogleSTTService,
    YandexSTTService,
    run_cloud_transcription,
)
from speechflow_tpu.io import AudioChunk

WORDS = [["hello", 0.1, 0.4], ["world", 0.5, 0.9]]


class FakeYandexCloud:
    """Scripted SpeechKit v2: PUT upload, POST submit, GET polls."""

    def __init__(self, poll_script=None, submit_limit_times=0):
        # poll_script: list of response dicts returned in order (last repeats)
        self.poll_script = poll_script or [self._done()]
        self.submit_limit_times = submit_limit_times
        self.calls = []
        self.sleeps = []

    @staticmethod
    def _done():
        return {"done": True, "response": {"chunks": [{"alternatives": [{
            "text": "hello world",
            "words": [{"word": w, "startTime": f"{b}s", "endTime": f"{e}s"}
                      for w, b, e in WORDS],
        }]}]}}

    def __call__(self, method, url, headers, payload):
        self.calls.append((method, url))
        assert headers["Authorization"].startswith("Api-Key ")
        if method == "PUT":
            assert isinstance(payload, bytes) and len(payload) > 0
            return {"uri": url}
        if method == "POST":
            assert payload["config"]["specification"]["rawResults"] is True
            assert payload["audio"]["uri"]
            if self.submit_limit_times > 0:
                self.submit_limit_times -= 1
                return {"message": "active operation limit exceeded"}
            return {"id": "op-42"}
        assert method == "GET" and url.endswith("/op-42")
        script = self.poll_script
        return script.pop(0) if len(script) > 1 else script[0]

    def sleep(self, seconds):
        self.sleeps.append(seconds)


@pytest.fixture()
def wav_file(tmp_path):
    sr = 8000
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = tmp_path / "utt.wav"
    AudioChunk(file_path=path, data=wav, sr=sr).save(path, overwrite=True)
    return path


def make_asr(cloud, service_cls=YandexSTTService, **kwargs):
    service = service_cls(
        credentials={"api_key": "k", "token": "t", "upload_url": "mem://bucket"},
        locale_code="en-US")
    return CloudASR(service=service, transport=cloud, sleep_func=cloud.sleep,
                    **kwargs)


def test_happy_path_writes_sidecars(wav_file):
    cloud = FakeYandexCloud(poll_script=[{"done": False}, FakeYandexCloud._done()])
    asr = make_asr(cloud)
    result = asr.process_file(wav_file)

    assert result["text"] == "hello world"
    assert result["timestamps"] == WORDS
    assert result["api"] == "YandexSTTService"

    saved = json.loads(wav_file.with_suffix(".json").read_text())
    assert saved["text"] == "hello world" and "date" in saved
    assert wav_file.with_suffix(".txt").read_text() == "hello world"
    # the annotator pipeline's step-0 contract (FileASR reads this)
    whisper = json.loads(wav_file.with_suffix(".whisper").read_text())
    assert whisper == {"text": "hello world", "timestamps": WORDS}
    # the pending poll slept once at poll_interval
    assert cloud.sleeps == [asr.poll_interval_s]
    # resample to the service rate happened before upload
    assert any(m == "PUT" for m, _ in cloud.calls)


def test_limit_backoff_then_success(wav_file):
    cloud = FakeYandexCloud(
        poll_script=[{"done": False, "message": "limit exceeded"},
                     FakeYandexCloud._done()],
        submit_limit_times=1)
    asr = make_asr(cloud)
    out = asr.process_file(wav_file)
    assert out["text"] == "hello world"
    # one submit-limit sleep + one poll-limit sleep, both at limit_sleep_s
    assert cloud.sleeps == [asr.limit_sleep_s, asr.limit_sleep_s]


def test_limit_raises_when_configured(wav_file):
    cloud = FakeYandexCloud(submit_limit_times=10)
    asr = make_asr(cloud, raise_on_asr_limit_exc=True)
    with pytest.raises(ASRRequestLimitException):
        asr.process_file(wav_file)
    assert cloud.sleeps == []


def test_unrecognized_speech_raises(wav_file):
    cloud = FakeYandexCloud(poll_script=[{"done": True, "response": {}}])
    with pytest.raises(ASRException, match="not recognized"):
        make_asr(cloud).process_file(wav_file)


def test_existing_sidecar_skipped_without_overwrite(wav_file):
    wav_file.with_suffix(".json").write_text(
        json.dumps({"text": "cached", "timestamps": []}))
    cloud = FakeYandexCloud()
    out = make_asr(cloud).process_file(wav_file)
    assert out["text"] == "cached" and cloud.calls == []


def test_json_to_txt_timeline(tmp_path):
    j = tmp_path / "utt.json"
    j.write_text(json.dumps({"text": "hello world",
                             "timestamps": [["hello", 61.0, 61.5],
                                            ["world", 62.0, 62.8]]}))
    out = CloudASR.json_to_txt(j)
    assert out.read_text() == "0:01:01:0:01:02\thello world\n"


def test_google_dialect(wav_file):
    class FakeGoogle:
        def __init__(self):
            self.sleeps = []

        def __call__(self, method, url, headers, payload):
            assert headers["Authorization"] == "Bearer t"
            if method == "PUT":
                return {}
            if method == "POST":
                assert payload["config"]["enableWordTimeOffsets"] is True
                assert payload["config"]["encoding"] == "LINEAR16"
                return {"name": "ops/7"}
            assert url.endswith("/operations/ops/7")
            return {"done": True, "response": {"results": [{"alternatives": [{
                "words": [{"word": w, "startTime": f"{b}s", "endTime": f"{e}s"}
                          for w, b, e in WORDS]}]}]}}

        def sleep(self, seconds):
            self.sleeps.append(seconds)

    cloud = FakeGoogle()
    out = make_asr(cloud, service_cls=GoogleSTTService).process_file(wav_file)
    assert out["text"] == "hello world" and out["timestamps"] == WORDS


def test_run_cloud_transcription_sweep(tmp_path, wav_file):
    # two files; the sweep must transcribe both and count them
    import shutil

    second = wav_file.parent / "utt2.wav"
    shutil.copy(wav_file, second)
    cloud = FakeYandexCloud()
    n = run_cloud_transcription(wav_file.parent, make_asr(cloud), ext=".wav")
    assert n == 2
    assert second.with_suffix(".whisper").exists()

"""Dataset preparers: synthetic corpus trees in the four public layouts are
restructured into the annotator's wav+txt convention (reference
annotator/prepare_datasets/*.py)."""

import json

import numpy as np
import pytest

from speechflow_tpu.annotator.prepare_datasets import (
    convert_to_wav,
    main,
    prepare_golos,
    prepare_hifi_tts,
    prepare_libri_tts,
    prepare_ljspeech,
)
from speechflow_tpu.io.audio import AudioChunk

SR = 24000


def _tone(seconds=0.2, freq=220.0, amp=0.1):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _write_wav(path, wav=None):
    path.parent.mkdir(parents=True, exist_ok=True)
    AudioChunk(data=wav if wav is not None else _tone(), sr=SR).save(path)


def test_ljspeech_layout(tmp_path):
    root = tmp_path / "LJSpeech-1.1"
    for i in range(3):
        _write_wav(root / "wavs" / f"LJ001-{i:04d}.wav")
    lines = [f"LJ001-{i:04d}|Raw {i}|Normalized text {i}." for i in range(4)]
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")

    n = prepare_ljspeech(root)
    assert n == 3  # 4th metadata row has no wav
    for i in range(3):
        txt = (root / "wavs" / f"LJ001-{i:04d}.txt").read_text()
        assert txt == f"Normalized text {i}."


def test_libri_tts_layout(tmp_path):
    root = tmp_path / "LibriTTS"
    utt = root / "train-clean" / "19" / "198"
    _write_wav(utt / "19_198_000000.wav")
    (utt / "19_198_000000.normalized.txt").write_text("Hello there.")
    (utt / "19_198_000000.original.txt").write_text("HELLO THERE")

    n = prepare_libri_tts(root)
    assert n == 1
    assert (utt / "19_198_000000.txt").read_text() == "Hello there."


def test_hifi_tts_layout_with_ogg_conversion(tmp_path):
    root = tmp_path / "hi_fi_tts_v0"
    _write_wav(root / "audio" / "0.wav")
    # second utterance ships compressed; the preparer converts it
    ref = _tone(0.3, freq=330.0)
    AudioChunk(data=ref, sr=SR).save(
        (root / "audio").joinpath("1.ogg"))
    manifest = [
        {"audio_filepath": "audio/0.wav", "text_normalized": "Zero."},
        {"audio_filepath": "audio/1.ogg", "text_normalized": "One."},
        {"audio_filepath": "audio/missing.wav", "text_normalized": "Nope."},
    ]
    (root / "manifest.json").write_text(
        "\n".join(json.dumps(m) for m in manifest), encoding="utf-8")

    n = prepare_hifi_tts(root)
    assert n == 2
    assert (root / "audio" / "0.txt").read_text() == "Zero."
    assert (root / "audio" / "1.txt").read_text() == "One."
    wav = root / "audio" / "1.wav"
    assert wav.exists() and not (root / "audio" / "1.ogg").exists()
    dec = AudioChunk(file_path=wav).load().waveform
    assert abs(len(dec) - len(ref)) < SR // 10  # codec may pad edges


def test_golos_layout_normalizes_loudness(tmp_path):
    root = tmp_path / "golos"
    quiet, loud = _tone(amp=0.01), _tone(amp=0.5)
    _write_wav(root / "crowd" / "0.wav", quiet)
    _write_wav(root / "crowd" / "1.wav", loud)
    manifest = [
        {"audio_filepath": "0.wav", "text": "quiet utterance"},
        {"audio_filepath": "1.wav", "text": "loud utterance"},
    ]
    (root / "crowd" / "manifest.jsonl").write_text(
        "\n".join(json.dumps(m) for m in manifest), encoding="utf-8")

    n = prepare_golos(root, target_dbfs=-30.0)
    assert n == 2
    meta = (root / "all_meta.txt").read_text().splitlines()
    assert len(meta) == 2 and meta[0].endswith("|quiet utterance")
    for i in range(2):
        wav = AudioChunk(file_path=root / "crowd" / f"{i}.wav").load().waveform
        rms_db = 20 * np.log10(np.sqrt(np.mean(wav**2)))
        assert rms_db == pytest.approx(-30.0, abs=1.0)
        assert (root / "crowd" / f"{i}.txt").exists()


def test_flac_raises_clear_error(tmp_path):
    f = tmp_path / "x.flac"
    f.write_bytes(b"fLaC....")
    with pytest.raises(RuntimeError, match="FLAC"):
        convert_to_wav(f)


def test_cli_entry(tmp_path):
    root = tmp_path / "LJSpeech-1.1"
    _write_wav(root / "wavs" / "a.wav")
    (root / "metadata.csv").write_text("a|raw|norm")
    assert main(["ljspeech", "-d", str(root)]) == 1

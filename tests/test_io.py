"""L0 IO layer tests: Config, AudioChunk, Timestamps, TextGrid/AudioSeg, flist."""

import os
import tempfile
from pathlib import Path

import numpy as np
import pytest

from speechflow_tpu.io import (
    AudioChunk,
    AudioSeg,
    Config,
    Serialize,
    TextGrid,
    Tier,
    Timestamps,
    change_config_file,
    construct_file_list,
    generate_file_list,
    read_file_list,
    split_file_list,
)
from tests.paths import MINI_SEGS

MINI = f"{MINI_SEGS}/EN/LJSpeech/000"


# ---------------------------------------------------------------- Config


def test_config_value_select():
    text = """
batch:
  size: {default: 48, debug: 4}
model:
  dim: {default: 512, debug: 32, ru: 256}
plain: 7
"""
    cfg = Config.create_from_yaml(text, value_select=["debug"])
    assert cfg["batch"]["size"] == 4
    assert cfg["model"]["dim"] == 32
    assert cfg["plain"] == 7
    cfg2 = Config.create_from_yaml(text)
    assert cfg2["batch"]["size"] == 48
    cfg3 = Config.create_from_yaml(text, value_select=["ru"])
    assert cfg3["model"]["dim"] == 256
    assert cfg3["batch"]["size"] == 48


def test_config_join_tag_and_roundtrip(tmp_path):
    text = 'root: /data\npath: !join [/data, speech, file.wav]\n'
    cfg = Config.create_from_yaml(text)
    assert cfg["path"] == os.path.join("/data", "speech", "file.wav")
    f = tmp_path / "cfg.yml"
    cfg.to_file(f)
    cfg2 = Config.create_from_file(f)
    assert cfg2["path"] == cfg["path"]
    assert cfg2.hash == cfg.hash


def test_config_sections_and_paths():
    cfg = Config({"a": {"b": {"c": 1}}, "d": 2})
    assert cfg.get_path("a.b.c") == 1
    cfg.set_path("a.b.x", 9)
    assert cfg["a"]["b"]["x"] == 9
    assert cfg.trim(["d"]).to_dict() == {"d": 2}
    assert cfg.find("c") == 1
    assert cfg.section("missing").to_dict() == {}


def test_change_config_file(tmp_path):
    f = tmp_path / "c.yml"
    f.write_text("a:\n  b: 1\n")
    cfg = change_config_file(f, {"a.b": 5, "new.key": "v"})
    assert cfg["a"]["b"] == 5
    reread = Config.create_from_file(f)
    assert reread["new"]["key"] == "v"


# ---------------------------------------------------------------- AudioChunk


def test_audio_roundtrip(tmp_path):
    sr = 24000
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    chunk = AudioChunk(data=wav, sr=sr)
    p = tmp_path / "a.wav"
    chunk.save(p)
    loaded = AudioChunk(file_path=p).load()
    assert loaded.sr == sr
    assert len(loaded) == sr
    assert np.abs(loaded.waveform - wav).max() < 1e-3


def test_audio_window_load(tmp_path):
    sr = 16000
    wav = np.arange(sr, dtype=np.float32) / sr
    AudioChunk(data=wav, sr=sr).save(tmp_path / "b.wav")
    sub = AudioChunk(file_path=tmp_path / "b.wav", begin=0.25, end=0.5).load()
    assert abs(len(sub) - sr // 4) <= 1
    assert abs(sub.duration - 0.25) < 1e-3


def test_audio_ops():
    sr = 8000
    wav = np.random.default_rng(0).normal(size=sr).astype(np.float32)
    c = AudioChunk(data=wav, sr=sr)
    c.multiple(256)
    assert len(c) % 256 == 0
    c.volume(0.5)
    resampled = c.copy().resample(16000)
    assert abs(len(resampled) - 2 * len(c)) < 4
    enc = c.mu_law_encode()
    dec = AudioChunk.mu_law_decode(enc)
    assert np.abs(dec - np.clip(c.waveform, -1, 1)).max() < 2e-2


def test_audio_bytes_roundtrip():
    sr = 22050
    wav = np.random.default_rng(1).uniform(-0.9, 0.9, sr // 2).astype(np.float32)
    blob = AudioChunk(data=wav, sr=sr).to_bytes()
    back = AudioChunk.from_bytes(blob)
    assert back.sr == sr
    assert np.abs(back.waveform - wav).max() < 1e-3


def test_reference_wav_loads():
    p = Path(MINI) / "0.wav"
    if not p.exists():
        pytest.skip("reference data unavailable")
    c = AudioChunk(file_path=p).load()
    assert c.sr == 24000
    assert c.duration > 5


# ---------------------------------------------------------------- Timestamps


def test_timestamps_basic():
    ts = Timestamps([[0.0, 0.5], [0.5, 1.25]])
    assert len(ts) == 2
    assert ts.begin == 0.0 and ts.end == 1.25
    assert np.allclose(ts.durations, [0.5, 0.75])
    shifted = ts.shift(1.0)
    assert shifted.begin == 1.0
    scaled = ts.scale(2.0)
    assert scaled.end == 2.5


def test_timestamps_from_durations_and_frames():
    ts = Timestamps.from_durations([0.1, 0.2, 0.3])
    assert abs(ts.end - 0.6) < 1e-9
    hop, sr = 256, 24000
    frames = ts.to_frames(hop, sr)
    assert frames.sum() == round(0.6 * sr / hop)
    # exact reconciliation to n_frames
    frames2 = ts.to_frames(hop, sr, n_frames=60)
    assert frames2.sum() == 60


# ---------------------------------------------------------------- TextGrid / AudioSeg


def test_textgrid_roundtrip(tmp_path):
    tg = TextGrid(0.0, 2.0)
    tg.add(Tier("text", [(0.0, 0.5, ""), (0.5, 1.5, 'say "hi"'), (1.5, 2.0, "")]))
    tg.add(Tier("phonemes", [(0.5, 1.0, "s"), (1.0, 1.5, "eI")]))
    f = tmp_path / "t.TextGrid"
    tg.save(f)
    back = TextGrid.load(f)
    assert back.tier_names == ["text", "phonemes"]
    assert back["text"].intervals[1][2] == 'say "hi"'
    assert back["phonemes"].intervals[0] == (0.5, 1.0, "s")


def test_reference_textgrid_parses():
    p = Path(MINI) / "0.TextGridStage3"
    if not p.exists():
        pytest.skip("reference data unavailable")
    seg = AudioSeg.load(p)
    assert seg.lang == "EN"
    assert seg.speaker_name == "LJSpeech"
    assert "phonemes" in seg.grid
    phs = seg.phonemes()
    assert len(phs) > 50
    words = seg.words()
    assert words[0][2].startswith("printing")
    b, e = seg.bos_eos_bounds()
    assert 0 <= b < e <= seg.duration + 1e-6


def test_audioseg_syntagma_split():
    p = Path(MINI) / "0.TextGridStage3"
    if not p.exists():
        pytest.skip("reference data unavailable")
    seg = AudioSeg.load(p)
    parts = seg.split_into_syntagmas()
    assert len(parts) >= 2
    assert all(pt.meta["sent_position"] in ("first", "internal", "last") for pt in parts)


def test_audioseg_save_roundtrip(tmp_path):
    tg = TextGrid(0.0, 1.0)
    tg.add(Tier("text", [(0.0, 1.0, "hello")]))
    seg = AudioSeg(AudioChunk(data=np.zeros(8000, np.float32), sr=8000), tg)
    seg.meta = {"lang": "EN", "speaker_name": "spk"}
    f = tmp_path / "s.TextGridStage3"
    seg.save(f, with_audio=True)
    back = AudioSeg.load(f)
    assert back.lang == "EN"
    assert back.audio_chunk.load().sr == 8000


# ---------------------------------------------------------------- flist / serialize


def test_flist(tmp_path):
    for i in range(10):
        (tmp_path / f"{i}.wav").write_bytes(b"")
    files = construct_file_list(tmp_path, ext=".wav")
    assert len(files) == 10
    train, test = split_file_list(files, split_ratio=0.8, seed=1)
    assert len(train) + len(test) == 10 and len(test) >= 1
    d = generate_file_list(tmp_path, ext=".wav", split_ratio=0.8)
    assert set(d) == {"train", "test"}
    manifest = tmp_path / "list.txt"
    manifest.write_text("\n".join(Path(f).name for f in files) + "\n# comment\n")
    rel = read_file_list(manifest, data_root=tmp_path, max_num_samples=5)
    assert len(rel) == 5


def test_serialize_roundtrip():
    obj = {"x": np.arange(10), "y": [1, "a", None]}
    blob = Serialize.dump(obj)
    back = Serialize.load(blob)
    assert np.array_equal(back["x"], obj["x"]) and back["y"] == obj["y"]
    blobs = Serialize.dumps([1, 2, 3])
    assert Serialize.loads(blobs) == [1, 2, 3]


def test_all_reference_segas_parse_and_roundtrip(tmp_path):
    """Every TextGridStage3 in the reference mini corpus parses, carries
    aligned phoneme/word tiers, and survives a save/load round trip with
    identical tier contents — corpus-wide parser parity, not one golden file."""
    import glob

    paths = sorted(glob.glob(
        f"{MINI_SEGS}/**/*.TextGridStage3",
        recursive=True))
    if not paths:
        pytest.skip("reference data unavailable")
    assert len(paths) >= 40
    for i, p in enumerate(paths):
        seg = AudioSeg.load(p)
        assert seg.lang in ("EN", "RU") and seg.speaker_name
        phs = seg.phonemes()
        assert len(phs) > 0
        ts = seg.phoneme_timestamps()
        assert len(ts) == len(phs)
        # timestamps are monotone within the utterance
        iv = np.asarray(ts.intervals)
        assert (iv[:, 1] >= iv[:, 0] - 1e-9).all()
        assert (iv[1:, 0] >= iv[:-1, 0] - 1e-9).all()
        # round trip preserves every tier's labels
        out = tmp_path / f"{i}.TextGridStage3"
        seg.save(out)
        back = AudioSeg.load(out)
        for tier in seg.grid.tiers:
            assert tier.labels == back.grid[tier.name].labels, (p, tier.name)


# ---------------------------------------------------------------- ogg / opus


DATA_DIR = Path(__file__).parent / "data"


def _codec_snr(decoded: np.ndarray, original: np.ndarray, sr: int) -> float:
    """SNR after aligning for codec latency (correlation-peak lag)."""
    corr = np.correlate(decoded[: 2 * sr], original[: sr // 2], "valid")
    lag = int(np.argmax(corr))
    n = min(len(decoded) - lag, len(original), sr)
    a, b = decoded[lag: lag + n], original[:n]
    return float(10 * np.log10(np.sum(b ** 2) / (np.sum((a - b) ** 2) + 1e-12)))


def test_ogg_vorbis_roundtrip(tmp_path):
    """save(.ogg) -> load: libvorbisenc encode, libvorbisfile decode
    (reference AudioChunk via soundfile, audio_io.py:39)."""
    from speechflow_tpu.io import AudioChunk
    from speechflow_tpu.io import codecs

    if not codecs.OGG_AVAILABLE:
        pytest.skip("system vorbis libraries unavailable")
    sr = 24000
    t = np.arange(sr * 2) / sr
    wav = (0.5 * np.sin(2 * np.pi * 220 * t)
           + 0.2 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    p = tmp_path / "a.ogg"
    AudioChunk(data=wav, sr=sr).save(p)
    assert p.stat().st_size < len(wav)  # actually compressed
    back = AudioChunk(file_path=p).load()
    assert back.sr == sr
    assert _codec_snr(back.data, wav, sr) > 15.0


def test_ogg_opus_roundtrip(tmp_path):
    """save(.opus) -> load: libopus + the pure-python RFC 7845 Ogg layer."""
    from speechflow_tpu.io import AudioChunk
    from speechflow_tpu.io import codecs

    if not codecs.OPUS_AVAILABLE:
        pytest.skip("system opus library unavailable")
    sr = 24000
    t = np.arange(sr * 2) / sr
    wav = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    p = tmp_path / "a.opus"
    AudioChunk(data=wav, sr=sr).save(p)
    back = AudioChunk(file_path=p).load(sr=sr)  # opus decodes at 48k, resampled
    assert back.sr == sr
    assert _codec_snr(back.data, wav, sr) > 10.0


def test_committed_ogg_fixtures_decode():
    """The committed fixtures (tests/tools/make_ogg_fixtures.py) decode to
    real speech-length audio and the codec sniffer identifies them."""
    from speechflow_tpu.io import AudioChunk
    from speechflow_tpu.io import codecs

    ogg, opus = DATA_DIR / "fixture.ogg", DATA_DIR / "fixture.opus"
    assert ogg.is_file() and opus.is_file()
    assert codecs.ogg_codec_of(ogg) == "vorbis"
    assert codecs.ogg_codec_of(opus) == "opus"
    if codecs.OGG_AVAILABLE:
        a = AudioChunk(file_path=ogg).load()
        assert 1.5 < a.duration < 2.5 and np.abs(a.data).max() > 0.01
    if codecs.OPUS_AVAILABLE:
        b = AudioChunk(file_path=opus).load()
        assert b.sr == 48000 and 1.5 < b.duration < 2.5
        assert np.abs(b.data).max() > 0.01


def test_annotator_media_to_opus(tmp_path):
    from speechflow_tpu.annotator.asr import convert_media_to_opus
    from speechflow_tpu.io import AudioChunk, codecs

    if not codecs.OPUS_AVAILABLE:
        pytest.skip("system opus library unavailable")
    sr = 24000
    wav = (0.3 * np.sin(2 * np.pi * 200 * np.arange(sr) / sr)).astype(np.float32)
    AudioChunk(data=wav, sr=sr).save(tmp_path / "u1.wav")
    AudioChunk(data=wav, sr=sr).save(tmp_path / "u2.wav")
    out = convert_media_to_opus(tmp_path)
    assert sorted(p.name for p in out) == ["u1.opus", "u2.opus"]
    assert all(codecs.ogg_codec_of(p) == "opus" for p in out)

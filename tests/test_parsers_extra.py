"""LibriSpeech + Prosody dataset parsers on synthesized corpus layouts
(reference: dataset_parsers/librispeech_ds_parser.py:21, prosody_ds_parser.py).
"""

from pathlib import Path

import numpy as np
import pytest
from tests.paths import MINI_SEGS

SEGS = Path(f"{MINI_SEGS}/EN/LJSpeech/000")


@pytest.fixture()
def librispeech_layout(tmp_path):
    """speaker/chapter/utt layout with an MFA-style alignment grid + wav."""
    from speechflow_tpu.io import AudioChunk, TextGrid, Tier

    utt_dir = tmp_path / "1034" / "121119"
    utt_dir.mkdir(parents=True)
    sr = 16000
    wav = (0.1 * np.sin(2 * np.pi * 220 * np.arange(int(1.5 * sr)) / sr)).astype(np.float32)
    AudioChunk(data=wav, sr=sr).save(utt_dir / "1034-121119-0001.wav")

    grid = TextGrid(0.0, 1.5)
    grid.add(Tier("words", [
        (0.0, 0.2, ""), (0.2, 0.7, "hello"), (0.7, 0.8, ""),
        (0.8, 1.3, "world"), (1.3, 1.5, ""),
    ]))
    grid.add(Tier("phones", [
        (0.0, 0.2, "sil"), (0.2, 0.4, "HH"), (0.4, 0.55, "AH0"),
        (0.55, 0.7, "L"), (0.7, 0.8, "sp"), (0.8, 1.0, "W"),
        (1.0, 1.15, "ER1"), (1.15, 1.3, "spn"), (1.3, 1.5, "sil"),
    ]))
    grid.save(utt_dir / "1034-121119-0001.TextGrid")
    return utt_dir / "1034-121119-0001.TextGrid"


def test_librispeech_parser(librispeech_layout):
    from speechflow_tpu.data.parsers import LibriSpeechDSParser

    parser = LibriSpeechDSParser()
    md = parser.reader(librispeech_layout)[0]
    ds = parser.to_datasample(md)
    assert ds is not None
    assert ds.text == "hello world"
    # sil/sp dropped, spn -> <UNK>
    assert ds.phonemes == ["HH", "AH0", "L", "W", "ER1", "<UNK>"]
    assert list(ds.word_lengths) == [3, 3]
    # timestamps cover exactly the word-covered phones
    ts = np.asarray(ds.phoneme_timestamps)
    assert ts.shape == (6, 2)
    assert ts[0][0] == pytest.approx(0.2) and ts[-1][1] == pytest.approx(1.3)
    # speaker from the LibriSpeech layout
    assert ds.speaker_name == "1034"
    assert Path(ds.audio_chunk.file_path).suffix == ".wav"
    # audio actually loads
    audio = ds.audio_chunk.load()
    assert audio.duration == pytest.approx(1.5, abs=0.01)


def test_librispeech_parser_align_dir_resolution(tmp_path):
    """Grids under a '...-align...' tree resolve audio in the mirror tree
    (reference strips '-align' from the path, librispeech_ds_parser.py:95)."""
    from speechflow_tpu.data.parsers import LibriSpeechDSParser

    a = tmp_path / "LibriSpeech-align" / "19"
    b = tmp_path / "LibriSpeech" / "19"
    a.mkdir(parents=True), b.mkdir(parents=True)
    (b / "x.wav").write_bytes(b"")
    got = LibriSpeechDSParser.resolve_audio(a / "x.TextGrid")
    assert got == b / "x.wav"


def test_librispeech_parser_registered():
    from speechflow_tpu.data.parsers import PARSERS

    assert "LibriSpeechDSParser" in PARSERS and "ProsodyParser" in PARSERS


@pytest.mark.skipif(not SEGS.is_dir(), reason="mini corpus unavailable")
def test_prosody_parser_on_stage3_segs():
    from speechflow_tpu.data.parsers import ProsodyParser

    parser = ProsodyParser(vocab_size=512)
    f = sorted(SEGS.glob("*.TextGridStage3"))[0]
    ds = parser.to_datasample(parser.reader(f)[0])
    assert ds is not None
    n = len(ds.words)
    assert n > 0
    assert ds.token_ids.shape == (n,) and ds.token_ids.dtype == np.int32
    assert ds.binary.shape == (n,) and set(np.unique(ds.binary)) <= {0, 1}
    # category defined exactly where binary is 1
    assert ((ds.category >= 0) == (ds.binary == 1)).all()
    # ids stay inside the hash vocabulary
    assert (ds.token_ids >= 0).all() and (ds.token_ids < 512).all()


def test_prosody_targets_mapping():
    from speechflow_tpu.data.parsers import prosody_targets

    words = ["hello", "world,", "again"]
    # explicit tier labels win
    b, c = prosody_targets(words, ["undefined", "3", "11"], n_classes=8)
    assert list(b) == [0, 1, 1]
    assert list(c) == [-1, 3, 3]  # 11 % 8
    # no tier: punctuation heuristic
    b, c = prosody_targets(words, None)
    assert list(b) == [0, 1, 0]

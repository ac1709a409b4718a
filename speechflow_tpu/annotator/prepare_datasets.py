"""Dataset preparers: restructure public TTS corpora into the layout the
annotator consumes (a ``<utterance>.wav`` + sibling ``<utterance>.txt`` per
utterance), matching the reference helpers
(``annotator/prepare_datasets/{ljspeech,libri_tts,hifi_tts,golos}.py``).

The reference ships one script per corpus; here one module exposes one
function per corpus plus a single CLI::

    python -m speechflow_tpu.annotator.prepare_datasets ljspeech -d <root>
    python -m speechflow_tpu.annotator.prepare_datasets golos -d <root> -nproc 8

Each preparer only *restructures* an already-downloaded tree (this build is
offline by design — the download step of the reference helpers is the user's
curl/tar): it writes transcription sidecars from the corpus' native metadata
format, converts compressed audio to wav where our codecs support it
(ogg/vorbis, ogg/opus — there is no FLAC decoder on this image, so ``.flac``
trees raise with a clear message), and loudness-normalizes where the
reference does (golos).
"""

from __future__ import annotations

import argparse
import json
import logging
import typing as tp
from pathlib import Path

import numpy as np

from speechflow_tpu.io.audio import AudioChunk, AudioFormat

LOGGER = logging.getLogger("speechflow_tpu")

__all__ = [
    "prepare_ljspeech",
    "prepare_libri_tts",
    "prepare_hifi_tts",
    "prepare_golos",
    "convert_to_wav",
]


def convert_to_wav(path: tp.Union[str, Path], remove_source: bool = True) -> Path:
    """Decode a supported compressed file next to itself as ``.wav``
    (reference ``_flac_to_wav``, ``libri_tts.py:9`` — their corpora ship
    flac; ours handles the formats the image has codecs for)."""
    path = Path(path)
    if path.suffix.lower() == ".flac":
        raise RuntimeError(
            f"{path}: no FLAC decoder is available in this environment — "
            "decode to wav externally (e.g. `flac -d`) before preparing")
    if not AudioFormat.check(path):
        raise RuntimeError(f"{path}: unsupported audio format")
    wav_path = path.with_suffix(".wav")
    if path.suffix.lower() != ".wav":
        AudioChunk(file_path=path).load().save(wav_path, overwrite=True)
        if remove_source:
            path.unlink()
    return wav_path


def _convert_tree_to_wav(data_root: Path, n_processes: int = 0) -> int:
    """Convert every non-wav supported audio file under ``data_root``."""
    from speechflow_tpu.data.parsers import EasyDSParser

    todo = [p for ext in (".ogg", ".oga", ".opus")
            for p in data_root.rglob(f"*{ext}")]
    if not todo:
        return 0
    parser = EasyDSParser(fn=convert_to_wav, n_processes=n_processes)
    ds = parser.read_datasamples([str(p) for p in todo])
    return len(ds)


def prepare_ljspeech(data_root: tp.Union[str, Path]) -> int:
    """LJSpeech: ``metadata.csv`` (``id|text|normalized_text``) → one
    ``wavs/<id>.txt`` next to each existing wav (reference
    ``ljspeech.py:14-26``)."""
    data_root = Path(data_root)
    metadata = (data_root / "metadata.csv").read_text(encoding="utf-8")
    wav_dir = data_root / "wavs"
    n = 0
    for line in metadata.splitlines():
        if not line.strip():
            continue
        wav_name, _text_orig, text_norm = line.split("|", maxsplit=2)
        wav_path = wav_dir / f"{wav_name}.wav"
        if wav_path.exists():
            wav_path.with_suffix(".txt").write_text(text_norm, encoding="utf-8")
            n += 1
    return n


def prepare_libri_tts(data_root: tp.Union[str, Path], n_processes: int = 0) -> int:
    """LibriTTS: promote ``*.normalized.txt`` sidecars to ``.txt`` and
    convert compressed audio (reference ``libri_tts.py:17-30``)."""
    data_root = Path(data_root)
    n = 0
    for file in data_root.rglob("*.normalized.txt"):
        text = file.read_text(encoding="utf-8")
        Path(str(file).replace(".normalized.txt", ".txt")).write_text(
            text, encoding="utf-8")
        n += 1
    _convert_tree_to_wav(data_root, n_processes)
    return n


def prepare_hifi_tts(data_root: tp.Union[str, Path], n_processes: int = 0) -> int:
    """Hi-Fi TTS: JSONL manifests (``{audio_filepath, text_normalized}`` per
    line) → per-utterance ``.txt``; convert compressed audio (reference
    ``hifi_tts.py:28-43``)."""
    data_root = Path(data_root)
    n = 0
    for manifest in data_root.rglob("*.json"):
        for line in manifest.read_text(encoding="utf-8").splitlines():
            if not line.strip():
                continue
            try:
                meta = json.loads(line)
                audio_path = data_root / meta["audio_filepath"]
                if audio_path.exists():
                    audio_path.with_suffix(".txt").write_text(
                        meta["text_normalized"], encoding="utf-8")
                    n += 1
            except Exception as e:  # noqa: BLE001 — mirror reference: skip bad lines
                LOGGER.warning("skip manifest line (%s): %s", manifest, e)
    _convert_tree_to_wav(data_root, n_processes)
    return n


def _dbfs(wav: np.ndarray) -> float:
    rms = float(np.sqrt(np.mean(np.square(wav, dtype=np.float64)) + 1e-20))
    return 20.0 * np.log10(max(rms, 1e-10))


def _golos_one(target_dbfs: float):
    def fn(path: str):
        wav_path, text = path.split("\t", maxsplit=1)
        chunk = AudioChunk(file_path=wav_path).load()
        assert chunk.sr >= 16000, f"{wav_path}: sample rate {chunk.sr} < 16k"
        gain = 10.0 ** ((target_dbfs - _dbfs(chunk.waveform)) / 20.0)
        chunk.volume(gain)
        chunk.save(wav_path, overwrite=True)
        Path(wav_path).with_suffix(".txt").write_text(text, encoding="utf-8")
        return f"{wav_path}|{text}"
    return fn


def prepare_golos(data_root: tp.Union[str, Path], target_dbfs: float = -30.0,
                  n_processes: int = 0) -> int:
    """Golos: per-folder ``manifest.jsonl`` (``{audio_filepath, text}``) →
    ``.txt`` sidecars + loudness normalization to ``target_dbfs`` + corpus
    ``all_meta.txt`` (reference ``golos.py:15-96``; their pydub dBFS gain
    match is the same RMS-ratio gain applied here)."""
    from speechflow_tpu.data.parsers import EasyDSParser

    data_root = Path(data_root)
    items: tp.List[str] = []
    for manifest in sorted(data_root.rglob("manifest.jsonl")):
        folder = manifest.parent
        for line in manifest.read_text(encoding="utf-8").splitlines():
            if not line.strip():
                continue
            meta = json.loads(line)
            wav_path = folder / meta["audio_filepath"]
            if wav_path.exists():
                items.append(f"{wav_path}\t{meta['text']}")
            else:
                LOGGER.warning("golos: missing %s", wav_path)

    parser = EasyDSParser(fn=_golos_one(target_dbfs), n_processes=n_processes)
    ds = parser.read_datasamples(items)
    lines = [s.additional["result"] for s in ds if s.additional.get("result")]
    (data_root / "all_meta.txt").write_text(
        "".join(f"{ln}\n" for ln in lines), encoding="utf-8")
    return len(lines)


_PREPARERS = {
    "ljspeech": prepare_ljspeech,
    "libri_tts": prepare_libri_tts,
    "hifi_tts": prepare_hifi_tts,
    "golos": prepare_golos,
}


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> int:
    p = argparse.ArgumentParser(description="Prepare a public TTS corpus")
    p.add_argument("corpus", choices=sorted(_PREPARERS))
    p.add_argument("-d", "--data_root", type=Path, required=True)
    p.add_argument("-nproc", "--n_processes", type=int, default=0)
    args = p.parse_args(argv)
    kwargs = {}
    if args.corpus != "ljspeech":
        kwargs["n_processes"] = args.n_processes
    n = _PREPARERS[args.corpus](args.data_root, **kwargs)
    print(f"DONE! Prepared {n} files")
    return n


if __name__ == "__main__":
    main()

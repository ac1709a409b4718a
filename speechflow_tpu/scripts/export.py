"""Relocatable inference bundle: pack trained checkpoints into ONE archive.

Capability parity with the reference's deployment artifact
(``Vocos.from_pretrained/from_sf_checkpoint``,
/root/reference/tts/vocoders/vocos/pretrained.py:47): training produces
experiment directories, but serving wants a single relocatable file holding
everything the eval interfaces need — model weights, the embedded
config/pipeline payload, alphabet + speaker/lang id maps (already inside the
orbax checkpoint's ``payload.pkl``), and the trained G2P frontend.

Pack::

    speechflow-tpu-export --tts <experiment-or-ckpt-dir> \
        [--vocoder <dir>] [--prosody <dir>] [--xtts <dir>] [--g2p g2p.pkl] \
        -o bundle.sftpu.tar.gz

Load (any machine, no experiment dirs needed)::

    from speechflow_tpu.scripts.export import InferenceBundle
    b = InferenceBundle.load("bundle.sftpu.tar.gz")
    audio = b.synthesize("Hello world!", lang="EN")
"""

from __future__ import annotations

import argparse
import json
import logging
import shutil
import tarfile
import tempfile
import time
import typing as tp
from pathlib import Path

LOGGER = logging.getLogger("speechflow_tpu")

MANIFEST = "manifest.json"
KINDS = ("tts", "vocoder", "prosody", "xtts")


def _resolve_ckpt(path: tp.Union[str, Path]) -> Path:
    """Accept an experiment dir, a checkpoints/ dir, or a step_* dir."""
    from speechflow_tpu.training import ExperimentSaver

    p = Path(path)
    if p.name.startswith("step_") and p.is_dir():
        return p
    last = ExperimentSaver.get_last_checkpoint(p)
    if last is None:
        raise FileNotFoundError(f"no step_* checkpoint under {p}")
    return last


def _discover_g2p(tts_ckpt: Path) -> tp.Optional[Path]:
    for c in (tts_ckpt / "g2p.pkl", tts_ckpt.parent / "g2p.pkl",
              tts_ckpt.parent.parent / "g2p.pkl"):
        if c.is_file():
            return c
    return None


def pack(out: tp.Union[str, Path],
         tts: tp.Optional[tp.Union[str, Path]] = None,
         vocoder: tp.Optional[tp.Union[str, Path]] = None,
         prosody: tp.Optional[tp.Union[str, Path]] = None,
         xtts: tp.Optional[tp.Union[str, Path]] = None,
         g2p: tp.Optional[tp.Union[str, Path]] = None) -> Path:
    """Copy each component's ``step_*`` checkpoint dir into a staging tree and
    tar it. Layout: ``<kind>/step_XXXX/...`` + ``<kind>/g2p.pkl`` (so the TTS
    interface's beside-the-checkpoint G2P discovery works unchanged) +
    ``manifest.json``."""
    comps = {k: v for k, v in
             {"tts": tts, "vocoder": vocoder, "prosody": prosody, "xtts": xtts}.items()
             if v is not None}
    if not comps:
        raise ValueError("nothing to pack: pass at least one checkpoint")
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)

    with tempfile.TemporaryDirectory(prefix="sftpu_export_") as td:
        stage = Path(td) / "bundle"
        stage.mkdir()
        manifest: tp.Dict[str, tp.Any] = {
            "format": "speechflow-tpu-bundle-v1",
            "created": time.strftime("%Y-%m-%d %H:%M:%S"),
            "components": {},
        }
        for kind, src in comps.items():
            ckpt = _resolve_ckpt(src)
            dst = stage / kind / ckpt.name
            shutil.copytree(ckpt, dst)
            manifest["components"][kind] = f"{kind}/{ckpt.name}"
            if kind in ("tts", "xtts"):
                g2p_src = Path(g2p) if g2p else _discover_g2p(ckpt)
                if g2p_src is not None and g2p_src.is_file():
                    shutil.copy(g2p_src, stage / kind / "g2p.pkl")
                    manifest["components"][f"{kind}_g2p"] = f"{kind}/g2p.pkl"
        (stage / MANIFEST).write_text(json.dumps(manifest, indent=2))

        with tarfile.open(out, "w:gz") as tf:
            for p in sorted(stage.rglob("*")):
                tf.add(p, arcname=str(p.relative_to(stage)))
    LOGGER.info("packed %s -> %s (%.1f MB)", sorted(comps), out,
                out.stat().st_size / 1e6)
    return out


class InferenceBundle:
    """A loaded bundle: lazily constructs the eval interfaces it contains."""

    def __init__(self, root: Path, manifest: dict):
        self.root = root
        self.manifest = manifest
        self._cache: tp.Dict[str, tp.Any] = {}

    # -- loading ---------------------------------------------------------------

    @classmethod
    def load(cls, path: tp.Union[str, Path],
             workdir: tp.Optional[tp.Union[str, Path]] = None) -> "InferenceBundle":
        """``path`` may be the .tar.gz archive or an already-extracted dir.
        Archives extract under ``workdir`` (default: a sibling dir named after
        the archive, reused if already extracted)."""
        p = Path(path)
        if p.is_dir():
            root = p
        else:
            root = Path(workdir) if workdir else p.parent / (p.name.split(".")[0] + ".d")
            marker = root / MANIFEST
            if not marker.exists():
                root.mkdir(parents=True, exist_ok=True)
                with tarfile.open(p, "r:gz") as tf:
                    tf.extractall(root, filter="data")
        manifest = json.loads((root / MANIFEST).read_text())
        if manifest.get("format") != "speechflow-tpu-bundle-v1":
            raise ValueError(f"not a speechflow-tpu bundle: {path}")
        return cls(root, manifest)

    def _ckpt(self, kind: str) -> Path:
        rel = self.manifest["components"].get(kind)
        if rel is None:
            raise KeyError(f"bundle has no {kind!r} component "
                           f"(has: {sorted(self.manifest['components'])})")
        return self.root / rel

    # -- interfaces --------------------------------------------------------------

    @property
    def tts(self):
        if "tts" not in self._cache:
            from speechflow_tpu.interface import TTSEvaluationInterface

            prosody = (self._ckpt("prosody")
                       if "prosody" in self.manifest["components"] else None)
            self._cache["tts"] = TTSEvaluationInterface(
                self._ckpt("tts"), prosody_ckpt=prosody)
        return self._cache["tts"]

    @property
    def vocoder(self):
        if "vocoder" not in self._cache:
            from speechflow_tpu.interface import VocoderEvaluationInterface

            self._cache["vocoder"] = VocoderEvaluationInterface(self._ckpt("vocoder"))
        return self._cache["vocoder"]

    @property
    def xtts(self):
        if "xtts" not in self._cache:
            from speechflow_tpu.interface import XTTSEvaluationInterface

            self._cache["xtts"] = XTTSEvaluationInterface(self._ckpt("xtts"))
        return self._cache["xtts"]

    # -- one-call chain ------------------------------------------------------------

    def synthesize(self, text: str, lang: str = "EN",
                   speaker: tp.Optional[str] = None, opts=None):
        """text -> mel (TTS) -> waveform (vocoder). Returns an AudioChunk
        (requires both components; use ``.tts`` alone for mel output)."""
        import numpy as np

        iface = self.tts
        speaker = speaker or (iface.get_speakers() or [None])[0]
        out = iface.synthesize(text, lang=lang, speaker=speaker, opts=opts)
        mels = np.asarray(out.after_postnet_spectrogram)
        lens = np.asarray(out.spectrogram_lengths)
        mel = np.concatenate([mels[j][: int(lens[j])] for j in range(mels.shape[0])])
        return self.vocoder.synthesize(mel)


def main(argv=None) -> str:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    for kind in KINDS:
        p.add_argument(f"--{kind}", default=None,
                       help=f"{kind} experiment / checkpoint dir")
    p.add_argument("--g2p", default=None, help="explicit g2p.pkl (else auto-discovered)")
    p.add_argument("-o", "--out", default="bundle.sftpu.tar.gz")
    args = p.parse_args(argv)
    out = pack(args.out, tts=args.tts, vocoder=args.vocoder,
               prosody=args.prosody, xtts=args.xtts, g2p=args.g2p)
    print(out)
    return str(out)


def cli() -> None:
    main()


if __name__ == "__main__":
    main()

"""Synthesis demo CLI (reference: tts/acoustic_models/scripts/eval.py):
synthesize text(s) from a TTS checkpoint (+ optional vocoder checkpoint for
waveforms) and write mel .npy / .wav artifacts.

  python -m speechflow_tpu.scripts.eval_tts --tts_ckpt <dir> \
      [--vocoder_ckpt <dir>] [--text "..."] [--out out_dir] [--platform cpu]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

LOGGER = logging.getLogger("speechflow_tpu")

DEFAULT_TEXTS = [
    "Printing, in the only sense with which we are at present concerned.",
    "The quick brown fox jumps over the lazy dog!",
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tts_ckpt", required=True)
    p.add_argument("--vocoder_ckpt", default=None)
    p.add_argument("--text", nargs="*", default=None)
    p.add_argument("--lang", default=None)
    p.add_argument("--speaker", default=None)
    p.add_argument("--out", default="eval_out")
    p.add_argument("--t_out", type=int, default=512)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from speechflow_tpu.interface import TTSEvaluationInterface, TTSOptions

    iface = TTSEvaluationInterface(args.tts_ckpt)
    lang = args.lang or (iface.get_languages() or ["EN"])[0]
    speaker = args.speaker or (iface.get_speakers() or [None])[0]
    texts = args.text or DEFAULT_TEXTS

    voc = None
    if args.vocoder_ckpt:
        from speechflow_tpu.interface import VocoderEvaluationInterface

        voc = VocoderEvaluationInterface(args.vocoder_ckpt)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for i, text in enumerate(texts):
        out = iface.synthesize(text, lang=lang, speaker=speaker,
                               opts=TTSOptions(t_out=args.t_out))
        mels = np.asarray(out.after_postnet_spectrogram)
        lens = np.asarray(out.spectrogram_lengths)
        mel = np.concatenate([mels[j][: int(lens[j])] for j in range(mels.shape[0])])
        np.save(out_dir / f"{i}.mel.npy", mel)
        written.append(str(out_dir / f"{i}.mel.npy"))
        if voc is not None:
            audio = voc.synthesize(mel)
            audio.save(out_dir / f"{i}.wav", overwrite=True)
            written.append(str(out_dir / f"{i}.wav"))
        LOGGER.info("synthesized %r -> %d frames", text[:40], len(mel))
    print("\n".join(written))
    return written


def cli() -> None:
    """Console entry point (pyproject [project.scripts]): exit-code semantics
    want None, while :func:`main` returns its result for programmatic use."""
    main()


if __name__ == "__main__":
    main()

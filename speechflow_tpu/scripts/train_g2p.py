"""G2P training CLI: mine word->phoneme pairs from the corpus segs, train the
aligned context-window classifier, report held-out PER, save ``g2p.pkl``.

The saved pickle is auto-discovered by ``TTSEvaluationInterface`` when placed
next to a TTS checkpoint (or in the experiment dir), turning raw-text
synthesis from the char-level fallback into real phonemization.  Capability
parity with the reference's external multilingual_text_parser
(tts_text_processors.py:57) minus its normalizer, which remains a hook.

Usage:
  python -m speechflow_tpu.scripts.train_g2p --data-root <SEGS dir> \
      --output experiments/my_tts/g2p.pkl [--holdout 0.1] [--steps 1200]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

LOGGER = logging.getLogger("speechflow_tpu")


def train_g2p_artifact(data_root, out_path, steps: int = 1200,
                       holdout: float = 0.0, seed: int = 0,
                       **train_kwargs) -> str:
    """Mine the corpus at ``data_root``, train, save ``g2p.pkl`` to
    ``out_path``; returns the saved path.  Called by the TTS train CLI so
    every experiment ships a raw-text frontend, and by ``main`` below."""
    from speechflow_tpu.models.g2p import (mine_g2p_lexicon,
                                           phoneme_error_rate, train_g2p)

    segs = sorted(Path(data_root).rglob("*.TextGrid*"))
    lexicon = mine_g2p_lexicon(segs)
    if not lexicon:
        raise ValueError(f"no (word, phoneme) pairs mined from {data_root}")
    LOGGER.info("mined %d (lang, word, pron) pairs from %d segs",
                len(lexicon), len(segs))

    rng = np.random.default_rng(seed)
    n_held = int(len(lexicon) * holdout)
    idx = rng.permutation(len(lexicon))
    held = [lexicon[i] for i in idx[:n_held]]
    train = [lexicon[i] for i in idx[n_held:]]

    g2p = train_g2p(train, steps=steps, seed=seed, **train_kwargs)
    if held:
        pers = []
        for lang in sorted({h[0] for h in held}):
            words = [w for hl, w, _ in held if hl == lang]
            preds = dict(zip(words, g2p.predict(words, lang, use_lexicon=False)))
            pers += [phoneme_error_rate(preds[w], pron)
                     for hl, w, pron in held if hl == lang]
        LOGGER.info("held-out PER over %d words: %.3f", len(held),
                    float(np.mean(pers)))

    # the final artifact carries the full lexicon (train + held-out)
    g2p.lexicon.update({(l.upper(), w): p for l, w, p in held})
    out = Path(out_path)
    if out.is_dir() or not out.suffix:
        out = out / "g2p.pkl"
    g2p.save(out)
    LOGGER.info("saved %s (lexicon %d, chunk classes %d)",
                out, len(g2p.lexicon), len(g2p.chunk_symbols))
    return str(out)


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True,
                    help="directory scanned recursively for *.TextGrid* segs")
    ap.add_argument("--output", default="g2p.pkl",
                    help="output pickle path (a directory gets /g2p.pkl)")
    ap.add_argument("--holdout", type=float, default=0.1,
                    help="fraction of word types held out for the PER report")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--hidden", type=int, default=384)
    ap.add_argument("--dropout", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    try:
        return train_g2p_artifact(args.data_root, args.output,
                                  steps=args.steps, holdout=args.holdout,
                                  seed=args.seed, hidden=args.hidden,
                                  dropout=args.dropout)
    except ValueError as e:
        raise SystemExit(str(e))


def cli() -> None:
    """Console entry point (pyproject [project.scripts]): exit-code semantics
    want None, while :func:`main` returns its result for programmatic use."""
    main()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()

"""Stand-in quality probes (r4 VERDICT weak #5 / next-step #9a).

Probe A — CPC phone discriminability: does the zero-egress CPC SSL model
(`models/ssl/cpc.py`, standing in for WavLM/wav2vec2 features) actually carry
*linguistic* information, or only waveform statistics?  The standard
measurement (SUPERB-style linear probing): freeze the features, train a
linear softmax classifier on frame-level phoneme labels from the corpus
TextGrid tiers, report held-out frame accuracy vs

  * a log-mel baseline probe (the classical feature the CPC must beat to
    justify its seat in `embeddings.ssl_features`), and
  * the majority-class floor.

Writes docs/standin_probes.json and prints the table; the committed record is
gated by tests/test_standin_probes.py.

Run: PYTHONPATH=. python tests/tools/standin_probes.py
"""

from __future__ import annotations

import json
import sys
import typing as tp
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tests.paths import MINI_SEGS  # noqa: E402

RECORD_PATH = REPO / "docs" / "standin_probes.json"
SR = 24000


def load_labelled_utts(max_utts: int = 40) -> tp.List[tp.Tuple[np.ndarray, tp.List]]:
    """[(wave, [(t0, t1, phoneme), ...])] from the vendored corpus (EN+RU)."""
    from speechflow_tpu.io.seg import AudioSeg

    utts = []
    for p in sorted(Path(f"{MINI_SEGS}").rglob("*.TextGridStage3"))[:max_utts]:
        seg = AudioSeg.load(p)
        wav = np.asarray(seg.audio_chunk.load(sr=SR).waveform, np.float32)
        phones = [(s, e, lbl) for (s, e, lbl) in seg.phonemes() if lbl]
        if len(wav) > SR // 2 and phones:
            utts.append((wav, phones))
    return utts


def frame_labels(phones, n_frames: int, hop: int,
                 vocab: tp.Dict[str, int]) -> np.ndarray:
    """Majority phoneme per feature frame; -1 where no phone covers."""
    y = np.full(n_frames, -1, np.int64)
    for s, e, lbl in phones:
        if lbl not in vocab:
            continue
        f0 = int(round(s * SR / hop))
        f1 = max(int(round(e * SR / hop)), f0 + 1)
        y[f0: min(f1, n_frames)] = vocab[lbl]
    return y


def logmel_features(wav: np.ndarray, hop: int = 256, n_mels: int = 80) -> np.ndarray:
    from speechflow_tpu.data.processors import np_dsp

    mag = np_dsp.magnitude_np(wav, n_fft=1024, hop_length=hop)
    mel = np_dsp.linear_to_mel_np(mag, sr=SR, n_mels=n_mels)
    return np_dsp.amp_to_db_np(mel).astype(np.float32)


def linear_probe(Xtr, ytr, Xte, yte, steps: int = 600, lr: float = 0.3,
                 seed: int = 0) -> float:
    """Full-batch multinomial logistic regression in jax; -> test accuracy."""
    import jax
    import jax.numpy as jnp
    import optax

    mu, sd = Xtr.mean(0), Xtr.std(0) + 1e-5
    Xtr = jnp.asarray((Xtr - mu) / sd)
    Xte = jnp.asarray((Xte - mu) / sd)
    ytr_j = jnp.asarray(ytr)
    n_cls = int(max(ytr.max(), yte.max())) + 1
    params = {"w": jnp.zeros((Xtr.shape[1], n_cls)), "b": jnp.zeros(n_cls)}
    tx = optax.adam(lr)

    def loss_fn(p):
        logits = Xtr @ p["w"] + p["b"]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, ytr_j).mean()

    @jax.jit
    def run(p, o):
        def body(carry, _):
            p, o = carry
            _, g = jax.value_and_grad(loss_fn)(p)
            upd, o = tx.update(g, o, p)
            return (optax.apply_updates(p, upd), o), 0.0

        (p, o), _ = jax.lax.scan(body, (p, o), jnp.arange(steps))
        return p

    params = run(params, tx.init(params))
    pred = np.asarray(jnp.argmax(Xte @ params["w"] + params["b"], -1))
    return float((pred == yte).mean())


def run_cpc_probe(cpc_steps: int = 800, seed: int = 0) -> dict:
    import jax.numpy as jnp

    from speechflow_tpu.models.ssl import train_cpc

    utts = load_labelled_utts()
    # utterance-level split: probe generalization across recordings
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(utts))
    n_te = max(len(utts) // 5, 2)
    te_idx = set(order[:n_te].tolist())

    phoneme_counts: tp.Dict[str, int] = {}
    for i, (_, phones) in enumerate(utts):
        if i in te_idx:
            continue
        for _, _, lbl in phones:
            phoneme_counts[lbl] = phoneme_counts.get(lbl, 0) + 1
    # keep phonemes seen enough to learn (and present in train)
    vocab = {lbl: i for i, lbl in enumerate(
        sorted(l for l, c in phoneme_counts.items() if c >= 5))}

    cpc = train_cpc([w for w, _ in utts], sr=SR, steps=cpc_steps, batch=8,
                    chunk_s=1.0, seed=seed)

    def collect(feature_fn, hop):
        Xtr, ytr, Xte, yte = [], [], [], []
        for i, (wav, phones) in enumerate(utts):
            X = feature_fn(wav)
            y = frame_labels(phones, len(X), hop, vocab)
            keep = y >= 0
            (Xte if i in te_idx else Xtr).append(X[keep])
            (yte if i in te_idx else ytr).append(y[keep])
        return (np.concatenate(Xtr), np.concatenate(ytr),
                np.concatenate(Xte), np.concatenate(yte))

    def cpc_feats(wav):
        return np.asarray(cpc(jnp.asarray(wav)[None])[0], np.float32)

    res = {}
    for name, fn, hop in (("cpc", cpc_feats, cpc.hop),
                          ("logmel", logmel_features, 256)):
        Xtr, ytr, Xte, yte = collect(fn, hop)
        acc = linear_probe(Xtr, ytr, Xte, yte, seed=seed)
        maj = float(np.mean(yte == np.bincount(ytr).argmax()))
        res[name] = {"frame_acc": round(acc, 4),
                     "majority_floor": round(maj, 4),
                     "n_train_frames": int(len(ytr)),
                     "n_test_frames": int(len(yte))}
    res["n_phonemes"] = len(vocab)
    res["n_utts"] = len(utts)
    res["cpc_steps"] = cpc_steps
    return res


def main() -> None:
    record = json.loads(RECORD_PATH.read_text()) if RECORD_PATH.exists() else {}
    record["cpc_phone_probe"] = run_cpc_probe()
    print(json.dumps(record["cpc_phone_probe"], indent=1))
    RECORD_PATH.write_text(json.dumps(record, indent=1) + "\n")
    print("record ->", RECORD_PATH)


if __name__ == "__main__":
    main()

"""Stand-in quality probes (r4 VERDICT weak #5 / next-step #9a).

Probe A — CPC phone discriminability: does the zero-egress CPC SSL model
(`models/ssl/cpc.py`, standing in for WavLm/wav2vec2 features) actually carry
*linguistic* information, or only waveform statistics?  The standard
measurement (SUPERB-style linear probing): freeze the features, train a
linear softmax classifier on frame-level phoneme labels from the corpus
TextGrid tiers, report held-out frame accuracy vs

  * a log-mel baseline probe (the classical feature the CPC must beat to
    justify its seat in `embeddings.ssl_features`), and
  * the majority-class floor.

Probe B — CTC ASR phoneme error rate: the in-framework recognizer
(`models/asr/ctc_model.py`, standing in for Whisper / cloud ASR in the
annotator) trained on the corpus train split, greedy-decoded on held-out
utterances; reports held-out PER (Levenshtein over phoneme sequences),
the number the standins audit lists as unmeasured.

Probe C — RVQ codec quality at bitrate: the trainable DAC-class codec
(`models/codec/rvq.py`) trained on corpus crops, round-tripped on held-out
audio; reports wideband PESQ / SI-SNR / MCD at the configuration's actual
bitrate vs the untrained-codec floor — "perceptual quality at bitrate",
previously unproven.

Writes docs/standin_probes.json and prints the table; the committed record is
gated by tests/test_standin_probes.py.

Run: PYTHONPATH=. python tests/tools/standin_probes.py [all|cpc|asr|codec]
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

    print(f"  cpc: training {cpc_steps} steps on {len(utts)} utts", flush=True)
    cpc = train_cpc([w for w, _ in utts], sr=SR, steps=cpc_steps, batch=8,
                    chunk_s=1.0, seed=seed)
    print("  cpc: trained; extracting features", flush=True)

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

    # Jit the forward (eager dispatch is pathological on tunneled TPU
    # backends) and pad waves into 1 s shape buckets so the whole corpus
    # compiles a handful of programs instead of one per utterance length.
    from flax import nnx

    fwd = nnx.jit(lambda m, w: m(w))

    def _n_frames(length: int) -> int:  # SAME-conv ceil-div chain
        t = length
        for s in cpc.p.strides:
            t = -(-t // s)
        return t

    def cpc_feats(wav):
        bucket = -(-len(wav) // SR) * SR
        padded = np.pad(wav, (0, bucket - len(wav)))
        feats = np.asarray(fwd(cpc, jnp.asarray(padded)[None])[0], np.float32)
        return feats[: _n_frames(len(wav))]

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


def _levenshtein(a: tp.Sequence, b: tp.Sequence) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def run_asr_probe(steps: int = 3000, seed: int = 0) -> dict:
    """Held-out phoneme error rate of the CTC recognizer stand-in."""
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from speechflow_tpu.models.asr import (CTCRecognizer,
                                           CTCRecognizerParams,
                                           greedy_ctc_decode)
    from speechflow_tpu.training.losses.zoo import CTCLoss

    utts = load_labelled_utts(max_utts=200)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(utts))
    n_te = max(len(utts) // 5, 2)
    te_idx = set(order[:n_te].tolist())

    # label space over the whole corpus: unseen-at-train phones simply can
    # never be emitted, so they count against held-out PER (honest accounting)
    vocab = {lbl: i + 1 for i, lbl in enumerate(  # 0 = CTC blank
        sorted({lbl for _, phones in utts for _, _, lbl in phones}))}

    mels = [logmel_features(w) for w, _ in utts]
    seqs = [[vocab[lbl] for _, _, lbl in phones] for _, phones in utts]
    t_max = max(len(m) for m in mels)
    u_max = max(len(s) for s in seqs)
    X = np.zeros((len(utts), t_max, mels[0].shape[1]), np.float32)
    T = np.asarray([len(m) for m in mels], np.int32)
    Y = np.zeros((len(utts), u_max), np.int32)
    U = np.asarray([len(s) for s in seqs], np.int32)
    for i, (m, s) in enumerate(zip(mels, seqs)):
        X[i, : len(m)] = m
        Y[i, : len(s)] = s

    tr_idx = np.asarray([i for i in range(len(utts)) if i not in te_idx])
    params = CTCRecognizerParams(n_symbols=len(vocab) + 1, n_mels=X.shape[2],
                                 dim=192, n_conv=2, time_stride=2)
    model = CTCRecognizer(params, rngs=nnx.Rngs(seed))
    opt = nnx.Optimizer(model, optax.adamw(optax.cosine_decay_schedule(
        2e-3, steps, alpha=0.05), weight_decay=1e-4), wrt=nnx.Param)
    ctc = CTCLoss(blank_id=0)

    def spec_augment(mel: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """SpecAugment-style time/frequency stripe masking (host-side) —
        the 50-utt corpus badly overfits without it (train PER 0.09 vs
        held-out 0.78 measured unregularized)."""
        m = mel.copy()
        n_mels = m.shape[2]
        for b in range(len(m)):
            t_len = int(lens[b])
            for _ in range(2):
                w = int(rng.integers(5, max(t_len // 8, 6)))
                t0 = int(rng.integers(0, max(t_len - w, 1)))
                m[b, t0: t0 + w] = 0.0
            for _ in range(2):
                w = int(rng.integers(2, 10))
                f0 = int(rng.integers(0, n_mels - w))
                m[b, :, f0: f0 + w] = 0.0
        return m

    @nnx.jit
    def step(model, opt, mel, t_len, tgt, u_len):
        def loss_fn(m):
            logits, out_lens = m(mel, lengths=t_len)
            return ctc(logits, tgt, lengths=out_lens, target_lengths=u_len)

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    batch = 8
    last = float("nan")
    for s in range(steps):
        pick = rng.choice(tr_idx, size=batch, replace=len(tr_idx) < batch)
        last = step(model, opt, jnp.asarray(spec_augment(X[pick], T[pick])),
                    jnp.asarray(T[pick]), jnp.asarray(Y[pick]),
                    jnp.asarray(U[pick]))
        if s % 500 == 0:
            print(f"  asr step {s}: ctc={float(last):.3f}", flush=True)

    @nnx.jit
    def infer(model, mel, t_len):
        return model(mel, lengths=t_len)

    def per_of(idx) -> float:
        errs = tot = 0
        for i in idx:
            logits, out_lens = infer(model, jnp.asarray(X[i][None]),
                                     jnp.asarray(T[i][None]))
            ids, _ = greedy_ctc_decode(np.asarray(logits[0, : int(out_lens[0])]))
            errs += _levenshtein(list(ids), seqs[i])
            tot += len(seqs[i])
        return errs / max(tot, 1)

    return {"per_test": round(per_of(sorted(te_idx)), 4),
            "per_train": round(per_of(tr_idx[: len(te_idx)].tolist()), 4),
            "final_ctc_loss": round(float(last), 4),
            "n_phonemes": len(vocab), "n_utts": len(utts),
            "n_test_utts": n_te, "steps": steps}


def run_codec_probe(steps: int = 4000, seed: int = 0) -> dict:
    """Round-trip quality of the trainable RVQ codec at its real bitrate."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from speechflow_tpu.models.codec import CodecParams, NeuralCodec
    from speechflow_tpu.models.vocoder.criterion import multires_stft_loss
    from speechflow_tpu.models.vocoder.metrics import (mel_cepstral_distortion,
                                                       si_snr)
    from speechflow_tpu.models.vocoder.pesq import pesq_wb

    utts = load_labelled_utts(max_utts=200)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(utts))
    n_te = max(len(utts) // 10, 2)
    te_waves = [utts[i][0] for i in order[:n_te]]
    tr_waves = [utts[i][0] for i in order[n_te:]]

    p = CodecParams(sample_rate=SR, channels=32, latent_dim=64,
                    strides=(4, 4, 8), n_quantizers=4, codebook_size=256)
    hop = int(np.prod(p.strides))
    bitrate_kbps = (p.n_quantizers * np.log2(p.codebook_size)
                    * SR / hop / 1000.0)
    codec = NeuralCodec(p, rngs=nnx.Rngs(seed))
    opt = nnx.Optimizer(codec, optax.adam(optax.cosine_decay_schedule(
        1e-3, steps, alpha=0.1)), wrt=nnx.Param)

    crop = 16384
    pool = np.concatenate([w for w in tr_waves if len(w) > crop])

    @nnx.jit
    def step(codec, opt, wav):
        def loss_fn(m):
            recon, _, vq = m(wav)
            real = wav[..., : recon.shape[-1]]
            return (jnp.mean(jnp.abs(recon - real)) + vq
                    + multires_stft_loss(recon, real,
                                         resolutions=((512, 128), (1024, 256))))

        loss, grads = nnx.value_and_grad(loss_fn)(codec)
        opt.update(codec, grads)
        return loss

    def batch_of(n=16):
        starts = rng.integers(0, len(pool) - crop, n)
        return jnp.asarray(np.stack([pool[s: s + crop] for s in starts]))

    @nnx.jit
    def roundtrip(codec, wav):
        recon, _, _ = codec(wav)
        return recon

    def evaluate(codec) -> dict:
        scores: tp.Dict[str, list] = {"pesq_wb": [], "si_snr": [], "mcd": []}
        pad_to = 6 * SR  # one roundtrip program for every eval utterance
        for w in te_waves:
            t = (min(len(w), pad_to) // hop) * hop
            padded = np.zeros(pad_to, np.float32)
            padded[:t] = w[:t]
            rec = np.asarray(roundtrip(codec, jnp.asarray(padded)[None])[0])
            t = min(t, len(rec))
            ref, deg = w[:t], rec[:t]
            scores["pesq_wb"].append(pesq_wb(ref, deg, sr=SR))
            scores["si_snr"].append(si_snr(deg, ref))
            scores["mcd"].append(mel_cepstral_distortion(deg[None], ref[None],
                                                         sr=SR))
        return {k: round(float(np.mean(v)), 4) for k, v in scores.items()}

    untrained = evaluate(codec)
    last = float("nan")
    for s in range(steps):
        last = step(codec, opt, batch_of())
        if s % 500 == 0:
            print(f"  codec step {s}: loss={float(last):.3f}", flush=True)

    return {"bitrate_kbps": round(float(bitrate_kbps), 2),
            "hop": hop, "n_quantizers": p.n_quantizers,
            "codebook_size": p.codebook_size,
            "untrained": untrained, "trained": evaluate(codec),
            "final_loss": round(float(last), 4),
            "n_test_utts": n_te, "steps": steps}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    record = json.loads(RECORD_PATH.read_text()) if RECORD_PATH.exists() else {}
    def save() -> None:  # resumable: persist after every stage
        RECORD_PATH.write_text(json.dumps(record, indent=1) + "\n")

    if which in ("all", "cpc"):
        record["cpc_phone_probe"] = run_cpc_probe()
        print(json.dumps(record["cpc_phone_probe"], indent=1))
        save()
    if which in ("all", "asr"):
        record["asr_per_probe"] = run_asr_probe()
        print(json.dumps(record["asr_per_probe"], indent=1))
        save()
    if which in ("all", "codec"):
        record["codec_bitrate_probe"] = run_codec_probe()
        print(json.dumps(record["codec_bitrate_probe"], indent=1))
        save()
    print("record ->", RECORD_PATH)


if __name__ == "__main__":
    main()

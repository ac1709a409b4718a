"""Trainable CTC phoneme recognizer tests (models/asr/ctc_model.py,
reference: CTC loss losses/ctc.py + external ASR transcription step)."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from speechflow_tpu.models.asr import (
    CTCRecognizer,
    CTCRecognizerParams,
    greedy_ctc_decode,
)
from speechflow_tpu.training.losses import CTCLoss


def test_greedy_decode_collapse():
    # logits argmax path: blank, A, A, blank, B, B, B, blank
    v = 4
    path = [0, 1, 1, 0, 2, 2, 2, 0]
    logits = np.full((len(path), v), -5.0, np.float32)
    for t, i in enumerate(path):
        logits[t, i] = 5.0
    ids, spans = greedy_ctc_decode(logits, hop_s=0.01)
    np.testing.assert_array_equal(ids, [1, 2])
    assert spans[0][0] == pytest.approx(0.01)
    assert spans[1][1] == pytest.approx(0.07)


@pytest.mark.slow
def test_ctc_recognizer_overfits_two_patterns():
    """The recognizer must learn to map two distinct synthetic mel patterns
    to their label sequences through the loss zoo's CTCLoss."""
    rng = np.random.default_rng(0)
    t_frames, n_mels = 40, 16
    # two "utterances": band-energy patterns encoding label sequences
    def utt(labels):
        mel = rng.normal(0, 0.1, (t_frames, n_mels)).astype(np.float32)
        seg = t_frames // len(labels)
        for j, lab in enumerate(labels):
            mel[j * seg : (j + 1) * seg, lab * 3 : lab * 3 + 3] += 2.0
        return mel

    seqs = [[1, 2, 3], [3, 1, 2]]
    mels = np.stack([utt(s) for s in seqs])
    targets = jnp.asarray(np.asarray(seqs, np.int32))

    params = CTCRecognizerParams(n_symbols=5, n_mels=n_mels, dim=48,
                                 time_stride=1)
    model = CTCRecognizer(params, rngs=nnx.Rngs(0))
    opt = nnx.Optimizer(model, optax.adam(3e-3), wrt=nnx.Param)
    loss_fn_ctc = CTCLoss(blank_id=0)

    @nnx.jit
    def step(model, opt, mel, tgt):
        def loss_fn(m):
            logits, out_lens = m(mel)
            return loss_fn_ctc(logits, tgt, lengths=out_lens,
                               target_lengths=jnp.asarray([3, 3]))

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    mel_j = jnp.asarray(mels)
    first = float(step(model, opt, mel_j, targets))
    for _ in range(150):
        last = float(step(model, opt, mel_j, targets))
    assert last < first * 0.2, (first, last)

    logits, _ = model(mel_j)
    for b, expected in enumerate(seqs):
        ids, _ = greedy_ctc_decode(np.asarray(logits)[b])
        assert list(ids) == expected, (b, list(ids), expected)


def test_ctc_phoneme_asr_backend(tmp_path):
    """The in-framework ASR backend loads a checkpoint and emits the
    reference .whisper transcript format."""
    from speechflow_tpu.annotator.asr import CTCPhonemeASR
    from speechflow_tpu.io import AudioChunk
    from speechflow_tpu.utils.state_io import save_module

    params = CTCRecognizerParams(n_symbols=6, n_mels=20, dim=32, n_conv=1)
    model = CTCRecognizer(params, rngs=nnx.Rngs(0))
    ckpt = save_module(model, params, tmp_path / "asr.pkl")
    asr = CTCPhonemeASR(ckpt, id_to_symbol={1: "a", 2: "b", 3: "c"})
    wav = (0.3 * np.sin(2 * np.pi * 200 * np.arange(24000) / 24000)).astype(np.float32)
    out = asr.transcribe(AudioChunk(data=wav, sr=24000))
    assert set(out) == {"text", "timestamps"}
    for item in out["timestamps"]:
        tok, b, e = item
        assert isinstance(tok, str) and 0 <= b <= e

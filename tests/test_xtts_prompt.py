"""XTTS audio-prompt (zero-shot voice-clone) conditioning.

Covers the capability the reference implements via XTTSDecoder's prompt path
(tts/acoustic_models/modules/components/decoders/xtts_decoder.py:94-104 +
common/gpts/gpt_acoustic.py:206-246 prepare_prompt_audio): a reference-audio
spectrogram is encoded and prefixed to the GPT context, so sampling copies
the prompt speaker's voice.

The cloning test builds a synthetic two-speaker corpus (low-pitch vs
high-pitch tone voices), trains the codec then the prompt-conditioned GPT
(no speaker-id condition — identity can only flow through the prompt), and
checks the synthesized audio's spectral embedding is closer to the prompt
speaker's centroid than to the other speaker's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from speechflow_tpu.models.tts.ar_decoders import GPTDecoder

SR = 24000
N_MELS = 20


def _mel(wav: np.ndarray) -> np.ndarray:
    from speechflow_tpu.data.processors import np_dsp

    mag = np_dsp.magnitude_np(wav.astype(np.float32))
    return np_dsp.normalize_mel_np(np_dsp.amp_to_db_np(
        np_dsp.linear_to_mel_np(mag, SR, N_MELS))).astype(np.float32)


def test_gpt_prompt_kv_cache_matches_naive(rng):
    """Greedy KV-cached sampling with a padded prompt prefix must match the
    full-trunk rerun exactly (prompt masking is part of the contract)."""
    gpt = GPTDecoder(n_text_tokens=16, n_audio_tokens=20, dim=32, n_layers=2,
                     n_heads=2, use_prompt=True, rngs=nnx.Rngs(2))
    text = jnp.asarray(rng.integers(0, 16, (2, 5)), jnp.int32)
    pe = jnp.asarray(rng.normal(size=(2, 4, 32)), jnp.float32)
    pl = jnp.asarray([4, 2], jnp.int32)  # second sample: 2 padded frames
    kv = gpt.generate(text, max_tokens=7, temperature=0.0,
                      prompt_emb=pe, prompt_lengths=pl)
    naive = gpt.generate_naive(text, max_tokens=7, temperature=0.0,
                               prompt_emb=pe, prompt_lengths=pl)
    assert (np.asarray(kv) == np.asarray(naive)).all(), (kv, naive)


def _pad_invariance(block_type: str, rng) -> None:
    """At a fixed padded shape, the *values* in the padded prompt region must
    not reach the loss: those keys are masked out of attention (positions are
    static slots, so shapes — not contents — set the positional layout)."""
    gpt = GPTDecoder(n_text_tokens=8, n_audio_tokens=12, dim=32, n_layers=1,
                     n_heads=2, use_prompt=True, block_type=block_type,
                     rngs=nnx.Rngs(0))
    text = jnp.asarray(rng.integers(0, 8, (2, 3)), jnp.int32)
    audio = jnp.asarray(rng.integers(0, 10, (2, 6)), jnp.int32)
    lens = jnp.asarray([6, 6], jnp.int32)
    pe = jnp.asarray(rng.normal(size=(2, 7, 32)), jnp.float32)
    pl = jnp.asarray([3, 5], jnp.int32)
    base = float(gpt.loss(text, audio, lens, prompt_emb=pe, prompt_lengths=pl))
    # scribble over the padded region only
    frames = jnp.arange(pe.shape[1])[None, :, None]
    junk = jnp.asarray(rng.normal(size=pe.shape) * 50.0, jnp.float32)
    pe_junk = jnp.where(frames >= pl[:, None, None], junk, pe)
    scrambled = float(gpt.loss(text, audio, lens, prompt_emb=pe_junk,
                               prompt_lengths=pl))
    assert abs(base - scrambled) < 1e-4, (base, scrambled)


def test_gpt_prompt_padding_is_masked(rng):
    _pad_invariance("attention", rng)


def test_retention_prompt_padding_is_masked(rng):
    _pad_invariance("retention", rng)


def _speaker_wave(f0: float, seed: int, t: int = 4096) -> np.ndarray:
    """A 'voice': harmonic stack at f0 with mild per-utterance variation."""
    rng = np.random.default_rng(seed)
    x = np.arange(t) / SR
    f = f0 * (1.0 + 0.02 * rng.normal())
    wav = (0.6 * np.sin(2 * np.pi * f * x)
           + 0.25 * np.sin(2 * np.pi * 2 * f * x)
           + 0.1 * np.sin(2 * np.pi * 3 * f * x))
    return (wav + 0.01 * rng.normal(size=t)).astype(np.float32)


def _spectral_emb(wav: np.ndarray) -> np.ndarray:
    """Mean mel vector — the spectral 'speaker embedding' for tone voices."""
    m = _mel(np.asarray(wav, np.float32))
    v = m.mean(axis=0)
    return v / (np.linalg.norm(v) + 1e-9)


@pytest.mark.slow
def test_xtts_prompt_voice_cloning(rng):
    """Identity must flow from prompt to output: train the prompt-conditioned
    GPT on two synthetic voices with NO speaker-id condition, then synthesize
    the same text with each speaker's (held-out) prompt and check the output's
    spectral embedding lands on the prompt speaker's side."""
    import optax

    from speechflow_tpu.models.codec.rvq import codec_criterion
    from speechflow_tpu.models.tts.xtts import XTTSModel, XTTSParams

    f0 = {"A": 160.0, "B": 480.0}
    waves = {s: [_speaker_wave(f0[s], seed=10 * i + ord(s))
                 for i in range(4)] for s in ("A", "B")}

    p = XTTSParams.create(
        n_symbols=8, n_speakers=1, dim=64, n_layers=2, n_heads=2,
        use_prompt=True, prompt_dim=N_MELS, prompt_layers=1,
        prompt_downsample=2, freeze_codec=True,
        codec={"channels": 16, "latent_dim": 24, "strides": (4, 4, 8),
               "n_quantizers": 1, "codebook_size": 48})
    model = XTTSModel(p, rngs=nnx.Rngs(0))

    # -- stage 1: codec learns to reconstruct the tone corpus ----------------
    all_wavs = jnp.asarray(np.stack(waves["A"] + waves["B"]))
    copt = nnx.Optimizer(model.codec, optax.adam(3e-3), wrt=nnx.Param)
    crit = codec_criterion(SR)

    @nnx.jit
    def codec_step(codec, copt):
        def loss_fn(c):
            losses = crit(c(all_wavs), {"waveform": all_wavs}, 0)
            return sum(losses.values()), losses

        (_, aux), grads = nnx.value_and_grad(loss_fn, has_aux=True)(codec)
        copt.update(codec, grads)
        return aux

    first = codec_step(model.codec, copt)
    for _ in range(250):
        last = codec_step(model.codec, copt)
    assert float(last["l1"]) < float(first["l1"]), "codec did not train"

    # -- stage 2: GPT learns codes conditioned only on the prompt ------------
    # same text for every utterance: the prompt is the only identity channel
    text = jnp.asarray(np.tile(np.arange(6), (6, 1)), jnp.int32)
    tgt, prm = [], []
    for s in ("A", "B"):
        for i in range(3):
            tgt.append(waves[s][i])
            prm.append(_mel(waves[s][(i + 1) % 3]))  # different utterance
    batch = {
        "waveform": jnp.asarray(np.stack(tgt)),
        "transcription": text,
        "prompt_mel": jnp.asarray(np.stack(prm)),
        "prompt_mel_lengths": jnp.asarray([m.shape[0] for m in prm], jnp.int32),
    }
    gopt = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

    @nnx.jit
    def gpt_step(model, gopt):
        def loss_fn(m):
            losses = m(batch)
            return losses["gpt_ce"], losses

        (loss, _), grads = nnx.value_and_grad(loss_fn, has_aux=True)(model)
        gopt.update(model, grads)
        return loss

    first = float(gpt_step(model, gopt))
    for _ in range(300):
        last = float(gpt_step(model, gopt))
    assert last < first * 0.7, (first, last)

    # -- eval: held-out prompts must steer the voice -------------------------
    centroids = {s: np.mean([_spectral_emb(w) for w in waves[s]], axis=0)
                 for s in ("A", "B")}
    n_codes = int(batch["waveform"].shape[1]) // model.codec.hop
    for s, other in (("A", "B"), ("B", "A")):
        pm = _mel(waves[s][3])  # held-out utterance as the prompt
        wav = model.synthesize(
            text[:1], max_tokens=n_codes, temperature=0.0,
            prompt_mel=jnp.asarray(pm[None]),
            prompt_mel_lengths=jnp.asarray([pm.shape[0]], jnp.int32))
        emb = _spectral_emb(np.asarray(wav)[0])
        sim_self = float(emb @ centroids[s])
        sim_other = float(emb @ centroids[other])
        assert sim_self > sim_other, (
            f"prompt {s}: output closer to {other} "
            f"(self={sim_self:.3f}, other={sim_other:.3f})")

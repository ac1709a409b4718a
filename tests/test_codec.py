"""Neural codec + RetNet tests: RVQ code grid shapes, encode/decode round
trip improves with training, retention-block GPT overfits codes."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from speechflow_tpu.models.codec import CodecParams, NeuralCodec
from speechflow_tpu.models.codec.rvq import codec_criterion
from speechflow_tpu.training import OptimizerConfig, Trainer, TrainerConfig

SR = 24000


def _tone_batch(rng, b=2, t=2048):
    x = np.arange(t) / SR
    wavs = [0.5 * np.sin(2 * np.pi * (180 + 60 * i) * x) for i in range(b)]
    return (np.stack(wavs) + 0.01 * rng.normal(size=(b, t))).astype(np.float32)


@pytest.mark.slow
def test_codec_shapes_and_roundtrip(rng):
    p = CodecParams(channels=16, latent_dim=32, strides=(4, 4, 8),
                    n_quantizers=3, codebook_size=64)
    codec = NeuralCodec(p, rngs=nnx.Rngs(0))
    wav = jnp.asarray(_tone_batch(rng))
    recon, codes, vq_loss = codec(wav)
    assert recon.shape == wav.shape
    assert codes.shape == (2, 2048 // 128, 3)
    assert codes.dtype in (jnp.int32, jnp.int64)
    assert float(vq_loss) >= 0
    # decode(encode(x)) shape-consistent
    dec = codec.decode(codec.encode(wav))
    assert dec.shape[1] >= wav.shape[1] - 128


@pytest.mark.slow
def test_codec_trains(rng):
    p = CodecParams(channels=24, latent_dim=32, strides=(4, 4, 8),
                    n_quantizers=2, codebook_size=64)
    codec = NeuralCodec(p, rngs=nnx.Rngs(0))
    batch = {"waveform": _tone_batch(rng)}
    tr = Trainer(codec, codec_criterion(SR),
                 lambda b: ({"waveform": b["waveform"]}, {"waveform": b["waveform"]}),
                 OptimizerConfig(lr=3e-3), TrainerConfig(max_steps=60, log_every=10**9))
    # Trainer calls model(inputs) with a dict; adapt via wrapper
    class Wrap(nnx.Module):
        def __init__(self, codec):
            self.codec = codec

        def __call__(self, inputs):
            return self.codec(inputs["waveform"])

    tr = Trainer(Wrap(codec), codec_criterion(SR),
                 lambda b: ({"waveform": b["waveform"]}, {"waveform": b["waveform"]}),
                 OptimizerConfig(lr=3e-3), TrainerConfig(max_steps=60, log_every=10**9))
    first = tr.training_step(batch)
    for _ in range(59):
        last = tr.training_step(batch)
    assert last["l1"] < first["l1"] * 0.7, (first["l1"], last["l1"])


@pytest.mark.slow
def test_retention_gpt_overfits(rng):
    import optax

    from speechflow_tpu.models.tts.ar_decoders import GPTDecoder

    gpt = GPTDecoder(n_text_tokens=16, n_audio_tokens=20, dim=64, n_layers=2,
                     n_heads=4, block_type="retention", rngs=nnx.Rngs(0))
    text = jnp.asarray(rng.integers(0, 16, (2, 5)), jnp.int32)
    audio = jnp.asarray(rng.integers(0, 18, (2, 8)), jnp.int32)
    lens = jnp.asarray([8, 8], jnp.int32)
    opt = nnx.Optimizer(gpt, optax.adam(3e-3), wrt=nnx.Param)

    @nnx.jit
    def step(gpt, opt):
        loss, grads = nnx.value_and_grad(lambda m: m.loss(text, audio, lens))(gpt)
        opt.update(gpt, grads)
        return loss

    first = float(step(gpt, opt))
    for _ in range(80):
        last = float(step(gpt, opt))
    assert last < first * 0.5, (first, last)


@pytest.mark.slow
def test_codec_feeds_gpt(rng):
    """XTTS path: waveform -> RVQ codes -> GPT teacher-forced loss."""
    from speechflow_tpu.models.tts.ar_decoders import GPTDecoder

    p = CodecParams(channels=16, latent_dim=32, strides=(4, 4, 8),
                    n_quantizers=1, codebook_size=32)
    codec = NeuralCodec(p, rngs=nnx.Rngs(0))
    wav = jnp.asarray(_tone_batch(rng))
    codes = codec.encode(wav)[..., 0]  # first quantizer stream
    gpt = GPTDecoder(n_text_tokens=16, n_audio_tokens=34, dim=32, n_layers=1,
                     n_heads=2, rngs=nnx.Rngs(1))
    text = jnp.asarray(rng.integers(0, 16, (2, 4)), jnp.int32)
    loss = gpt.loss(text, codes.astype(jnp.int32),
                    jnp.full((2,), codes.shape[1], jnp.int32))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_xtts_model_end_to_end(rng):
    """Text -> GPT-over-codes -> codec decode; training loss decreases."""
    import optax

    from speechflow_tpu.models.tts.xtts import XTTSModel, XTTSParams

    p = XTTSParams.create(
        n_symbols=16, n_speakers=2, dim=48, n_layers=1, n_heads=2,
        codec={"channels": 12, "latent_dim": 16, "strides": (4, 4, 8),
               "n_quantizers": 1, "codebook_size": 32})
    model = XTTSModel(p, rngs=nnx.Rngs(0))
    batch = {
        "waveform": jnp.asarray(_tone_batch(rng)),
        "transcription": jnp.asarray(rng.integers(0, 16, (2, 6)), jnp.int32),
        "speaker_id": jnp.asarray([0, 1], jnp.int32),
    }
    opt = nnx.Optimizer(model, optax.adam(2e-3), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt):
        def loss_fn(m):
            losses = m(batch)
            return losses["gpt_ce"], losses

        (loss, _), grads = nnx.value_and_grad(loss_fn, has_aux=True)(model)
        opt.update(model, grads)
        return loss

    first = float(step(model, opt))
    for _ in range(40):
        last = float(step(model, opt))
    assert last < first, (first, last)

    wav = model.synthesize(batch["transcription"], batch["speaker_id"],
                           max_tokens=8, temperature=0.0)
    assert wav.shape[0] == 2 and wav.shape[1] == 8 * model.codec.hop
    assert np.isfinite(np.asarray(wav)).all()


@pytest.mark.slow
def test_denoiser(rng):
    from speechflow_tpu.models.vocoder import Vocos, VocosParams
    from speechflow_tpu.models.vocoder.denoiser import Denoiser

    voc = Vocos(VocosParams(dim=48, n_layers=1, n_mels=20, n_fft=512,
                            hop_length=128), rngs=nnx.Rngs(0))
    den = Denoiser(voc, n_mels=20, n_fft=512, hop_length=128, bias_frames=16)
    wav = jnp.asarray(_tone_batch(rng, t=4096))
    out = den(wav, strength=0.05)
    assert out.shape == wav.shape
    assert np.isfinite(np.asarray(out)).all()
    # zero strength ~ identity
    out0 = den(wav, strength=0.0)
    assert float(jnp.abs(out0 - wav).max()) < 1e-3

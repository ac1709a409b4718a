"""Trainable CPC SSL model tests (models/ssl/cpc.py, reference:
SSLProcessor over pretrained wav2vec2/WavLM, audio_processors.py:334)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from speechflow_tpu.models.ssl import CPCModel, CPCParams, cpc_infonce_loss, train_cpc

SR = 24000


def _voice(f0, n=SR, seed=0):
    t = np.arange(n) / SR
    r = np.random.default_rng(seed)
    sig = sum(np.sin(2 * np.pi * k * f0 * t + r.uniform(0, 6.28)) / k
              for k in range(1, 20))
    return (0.2 * sig).astype(np.float32)


def test_cpc_shapes_and_hop():
    p = CPCParams(channels=32, latent_dim=16, context_dim=24)
    model = CPCModel(p, rngs=nnx.Rngs(0))
    wav = jnp.asarray(np.random.default_rng(0).uniform(-0.3, 0.3, (2, 8000)).astype(np.float32))
    feats = model(wav)
    assert feats.shape[0] == 2 and feats.shape[2] == 24
    assert abs(feats.shape[1] - 8000 / model.hop) <= 1
    assert np.isfinite(np.asarray(feats)).all()


@pytest.mark.slow
def test_cpc_infonce_decreases():
    waves = [_voice(f, seed=i) for i, f in enumerate((120, 170, 230))]
    p = CPCParams(channels=32, latent_dim=16, context_dim=24, n_predict_steps=2)
    model = CPCModel(p, rngs=nnx.Rngs(0))
    wav = jnp.asarray(np.stack([w[:8000] for w in waves]))
    first = float(cpc_infonce_loss(model, wav))
    model = train_cpc(waves, sr=SR, steps=120, batch=3, chunk_s=8000 / SR,
                      params=p, seed=0)
    last = float(cpc_infonce_loss(model, wav))
    assert last < first * 0.9, (first, last)


def test_cpc_hook_and_handler(tmp_path):
    from speechflow_tpu.data.core.datasample import AudioDataSample
    from speechflow_tpu.data.processors.embeddings import ssl_features
    from speechflow_tpu.io import AudioChunk
    from speechflow_tpu.utils.state_io import save_module

    p = CPCParams(channels=16, latent_dim=8, context_dim=12)
    model = CPCModel(p, rngs=nnx.Rngs(0))
    ckpt = save_module(model, p, tmp_path / "cpc.pkl")
    ds = AudioDataSample(audio_chunk=AudioChunk(data=_voice(150), sr=SR))
    out = ssl_features(ds, model_ckpt=str(ckpt))
    assert out.ssl_feat.shape[1] == 12  # context_dim, not the mel fallback
    assert np.isfinite(out.ssl_feat).all()

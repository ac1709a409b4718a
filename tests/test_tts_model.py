"""Acoustic model kit tests: forward/inference shapes for all component
combinations, CFM decoder training+generation, and real overfit on the
reference mini dataset through the Trainer."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from speechflow_tpu.models.tts import (
    ParallelTTSModel,
    ParallelTTSParams,
    TTSBatchProcessor,
    TTSCriterion,
)
from speechflow_tpu.models.tts.data_types import TTSForwardInput
from speechflow_tpu.training import OptimizerConfig, Trainer, TrainerConfig
from tests.paths import MINI_SEGS

B, N, T, MELS = 2, 16, 64, 40


def _inputs(rng, n_speakers=4):
    durs = rng.integers(2, 6, size=(B, N)).astype(np.float32)
    # scale durations to sum exactly to T
    for i in range(B):
        durs[i] = np.round(durs[i] * T / durs[i].sum())
        durs[i, -1] += T - durs[i].sum()
    return TTSForwardInput(
        transcription=jnp.asarray(rng.integers(1, 50, size=(B, N)), jnp.int32),
        transcription_lengths=jnp.asarray([N, N - 4], jnp.int32),
        speaker_id=jnp.asarray(rng.integers(0, n_speakers, size=(B,)), jnp.int32),
        lang_id=jnp.zeros((B,), jnp.int32),
        durations=jnp.asarray(durs),
        aggregate_pitch=jnp.asarray(rng.uniform(100, 300, (B, N)).astype(np.float32)),
        aggregate_energy=jnp.asarray(rng.uniform(0, 10, (B, N)).astype(np.float32)),
        mel=jnp.asarray(rng.normal(size=(B, T, MELS)).astype(np.float32)),
        mel_lengths=jnp.asarray([T, T - 8], jnp.int32),
    )


def _params(**kw):
    base = dict(n_symbols=60, n_speakers=4, n_mels=MELS, encoder_dim=64,
                encoder_layers=2, decoder_dim=64, decoder_layers=2,
                token_emb_dim=64, speaker_emb_dim=32, postnet_dim=64,
                max_output_length=T)
    base.update(kw)
    return ParallelTTSParams.create(base)


def test_forward_shapes_wrapper(rng):
    model = ParallelTTSModel(_params(), rngs=nnx.Rngs(0))
    out = model(_inputs(rng), training=True)
    assert out.spectrogram.shape == (2, B, T, MELS)
    assert out.gate.shape == (B, T)
    assert set(out.variance_predictions) == {"aggregate_pitch", "aggregate_energy", "durations"}
    assert out.attention.shape == (B, T, N)
    assert np.isfinite(np.asarray(out.spectrogram)).all()


def test_forward_cfm_and_style(rng):
    p = _params(decoder_type="cfm", use_style_encoder=True, cfm_n_timesteps=4,
                condition_method="adanorm", condition_levels=(0, 2))
    model = ParallelTTSModel(p, rngs=nnx.Rngs(0))
    inp = _inputs(rng)
    out = model(inp, training=True)
    assert "cfm" in out.additional_losses
    assert "vae_kl" in out.additional_losses
    assert np.isfinite(float(out.additional_losses["cfm"]))
    # inference: Euler sampling
    gen = model.inference(inp, t_out=T)
    assert gen.spectrogram.shape == (2, B, T, MELS)
    assert np.isfinite(np.asarray(gen.spectrogram)).all()


def test_inference_uses_predicted_durations(rng):
    model = ParallelTTSModel(_params(), rngs=nnx.Rngs(0))
    inp = _inputs(rng)
    # drop teacher durations/mel: inference path must still produce output
    import dataclasses

    inf_inp = dataclasses.replace(inp, durations=None, mel=None, mel_lengths=None,
                                  aggregate_pitch=None, aggregate_energy=None)
    out = model.inference(inf_inp, t_out=T)
    assert out.spectrogram.shape == (2, B, T, MELS)
    assert int(out.spectrogram_lengths.max()) <= T


def test_inverse_speaker_and_ling(rng):
    p = _params(use_inverse_speaker_classifier=True, use_ling_feat=True,
                ling_feat_dim=8)
    model = ParallelTTSModel(p, rngs=nnx.Rngs(0))
    import dataclasses

    inp = dataclasses.replace(_inputs(rng),
                              ling_feat=jnp.asarray(np.random.default_rng(0).normal(size=(B, N, 8)).astype(np.float32)))
    out = model(inp, training=True)
    assert out.additional_content["inverse_speaker_logits"].shape == (B, 4)


def test_criterion_full(rng):
    model = ParallelTTSModel(_params(), rngs=nnx.Rngs(0))
    inp = _inputs(rng)
    out = model(inp, training=True)
    from speechflow_tpu.models.tts.data_types import TTSTarget

    tgt = TTSTarget(mel=inp.mel, mel_lengths=inp.mel_lengths,
                    gate=(jnp.arange(T)[None] >= inp.mel_lengths[:, None] - 1).astype(jnp.float32),
                    durations=inp.durations, aggregate_pitch=inp.aggregate_pitch,
                    aggregate_energy=inp.aggregate_energy,
                    transcription_lengths=inp.transcription_lengths,
                    speaker_id=inp.speaker_id)
    losses = TTSCriterion()(out, tgt, jnp.asarray(0))
    assert {"spectral", "gate", "durations", "aggregate_pitch", "aggregate_energy"} <= set(losses)
    for v in losses.values():
        assert np.isfinite(float(v))


@pytest.fixture(scope="module")
def real_batch():
    import os

    mini = f"{MINI_SEGS}"
    if not os.path.isdir(mini):
        pytest.skip("reference mini dataset unavailable")
    from speechflow_tpu.data.core.components import DataPipeline

    cfg = Path(__file__).parent.parent / "configs" / "tts_data_24khz.yml"
    dp = DataPipeline.init_from_config(cfg, value_select=["debug"])
    dp.cfg.set_path("dirs.data_root", mini)
    dp.init_components()
    batch = dp["train"].sample_batch(2)
    return dp, batch


@pytest.mark.slow
def test_overfit_real_batch(real_batch):
    """End-to-end: real TextGrid batch through Trainer; spectral loss halves."""
    dp, batch = real_batch
    c = batch.collated_samples
    params = ParallelTTSParams.create(
        n_symbols=len(dp.alphabet), n_speakers=4, n_mels=c.mel.shape[-1],
        encoder_dim=96, encoder_layers=2, decoder_dim=96, decoder_layers=2,
        token_emb_dim=96, speaker_emb_dim=32, postnet_dim=96,
        max_output_length=int(c.mel.shape[1]))
    model = ParallelTTSModel(params, rngs=nnx.Rngs(0))
    trainer = Trainer(model, TTSCriterion(), TTSBatchProcessor(),
                      OptimizerConfig(lr=2e-3),
                      TrainerConfig(max_steps=60, log_every=10**9))

    class Fixed:
        def next_batch(self):
            return batch

    first = trainer.training_step(batch)
    for _ in range(59):
        last = trainer.training_step(batch)
    assert last["spectral"] < first["spectral"] * 0.5, (first, last)


@pytest.mark.slow
def test_variance_predictor_with_discriminator(rng):
    """WithDiscriminator variant (reference: tokenlevel_predictor.py:214):
    LSGAN losses appear in additional_losses and are finite; inference
    is unaffected."""
    params = _params(variances=(
        {"name": "aggregate_pitch", "use_discriminator": True},
        {"name": "durations"},
    ))
    model = ParallelTTSModel(params, rngs=nnx.Rngs(0))
    out = model(_inputs(rng), training=True)
    al = out.additional_losses
    assert "aggregate_pitch_disc_loss" in al and "aggregate_pitch_gen_loss" in al
    assert np.isfinite(float(al["aggregate_pitch_disc_loss"]))
    assert np.isfinite(float(al["aggregate_pitch_gen_loss"]))
    # discriminator path must not leak into inference
    inf = model.inference(_inputs(rng), t_out=T)
    assert "aggregate_pitch_disc_loss" not in (inf.additional_losses or {})


@pytest.mark.slow
def test_gradtts_fa_in_model_aligner(rng):
    """GradTTS-FA (reference: gardtts_fa.py:86): trains without external
    durations; MAS durations sum to mel lengths; losses decrease under
    gradient steps; inference uses the internal duration predictor."""
    import optax

    params = _params(variances=({"name": "durations", "use_gradtts_fa": True,
                                 "fa_feat_dim": MELS},))
    model = ParallelTTSModel(params, rngs=nnx.Rngs(0))
    inputs = _inputs(rng)
    import dataclasses
    inputs = dataclasses.replace(inputs, durations=None)  # no external aligner
    out = model(inputs, training=True)
    assert "fa_duration" in out.additional_losses
    assert "fa_prior" in out.additional_losses
    durs = out.variance_predictions["durations_fa"]
    np.testing.assert_array_equal(np.asarray(durs.sum(-1), np.int32),
                                  np.asarray(inputs.mel_lengths))

    opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    def loss_fn(m):
        o = m(inputs, training=True)
        return o.additional_losses["fa_prior"] + o.additional_losses["fa_duration"]

    l0 = float(loss_fn(model))
    for _ in range(8):
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
    assert float(loss_fn(model)) < l0

    inf = model.inference(dataclasses.replace(inputs, mel=None, mel_lengths=None), t_out=T)
    assert inf.spectrogram.shape == (2, B, T, MELS)


@pytest.mark.slow
def test_cfm_batched_cfg_matches_sequential(rng):
    """The batched-CFG Euler solve (one doubled-batch estimator call) must
    match the sequential two-call formulation exactly."""
    import jax
    from speechflow_tpu.models.tts.decoders import CFMDecoder
    from speechflow_tpu.utils.masks import apply_mask, sequence_mask
    import jax.numpy as jnp
    from flax import nnx as _nnx

    dim_in, dim_out, b, n = 16, 12, 2, 10
    dec = CFMDecoder(dim_in=dim_in, dim_out=dim_out, dim=32, n_layers=1,
                     n_heads=2, cond_dim=8, n_timesteps=4, cfg_scale=1.5,
                     rngs=_nnx.Rngs(0))
    content = jnp.asarray(rng.normal(size=(b, n, dim_in)).astype(np.float32))
    lengths = jnp.asarray([n, n - 3], jnp.int32)
    cond = jnp.asarray(rng.normal(size=(b, 8)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    _, x_batched = dec.generate(content, lengths, cond, key=key)

    # sequential oracle: same math, two _dphi calls per step
    mu = dec.prior(content)
    z = jax.random.normal(key, mu.shape) * dec.temperature
    s = jnp.linspace(0.0, 1.0, dec.n_timesteps + 1)
    ts = 1.0 - jnp.cos(0.5 * jnp.pi * s)
    x = z
    fake_c = jnp.broadcast_to(dec.fake_content[...][None, None, :], content.shape)
    fake_e = jnp.broadcast_to(dec.fake_condition[...][None, :], cond.shape)
    for i in range(dec.n_timesteps):
        tb = jnp.full((b,), ts[i])
        v_c = dec._dphi(x, mu, content, tb, cond, lengths)
        v_un = dec._dphi(x, mu, fake_c, tb, fake_e, lengths)
        v = v_c + dec.cfg_scale * (v_c - v_un)
        x = x + (ts[i + 1] - ts[i]) * v
    x_seq = apply_mask(x, sequence_mask(lengths, x.shape[1]))

    np.testing.assert_allclose(np.asarray(x_batched), np.asarray(x_seq),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("enc", ["cbhg", "conformer", "variance_encoder", "sf",
                                 "ling_condition"])
def test_new_encoders_forward_shapes(rng, enc):
    """Round-2 encoder zoo additions (reference: encoders/{cbhg,conformer,
    variance_encoder,source_filter_encoder,ling_condition}.py)."""
    from speechflow_tpu.models.tts.encoders import TTS_ENCODERS

    e = TTS_ENCODERS[enc](dim_in=24, dim_out=32, dim=32, n_layers=1, n_heads=2,
                          ling_feat_dim=10, lm_feat_dim=6, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.normal(size=(B, N, 24)).astype(np.float32))
    lens = jnp.asarray([N, N - 5], jnp.int32)
    kwargs = {}
    if enc == "sf":
        kwargs = {"pitch": jnp.asarray(rng.uniform(80, 400, (B, N)).astype(np.float32)),
                  "energy": jnp.asarray(rng.uniform(0, 100, (B, N)).astype(np.float32))}
    elif enc == "ling_condition":
        kwargs = {"ling_feat": jnp.asarray(rng.normal(size=(B, N, 10)).astype(np.float32)),
                  "lm_feat": jnp.asarray(rng.normal(size=(B, N, 6)).astype(np.float32))}
    out = e(x, lens, deterministic=True, **kwargs)
    assert out.shape == (B, N, 32)
    assert np.isfinite(np.asarray(out)).all()
    # padding must be masked out
    assert np.allclose(np.asarray(out)[1, N - 5 :], 0.0)


@pytest.mark.parametrize("enc", ["cbhg", "conformer", "sf", "ling_condition"])
@pytest.mark.slow
def test_new_encoders_in_model(rng, enc):
    params = _params(encoder_type=enc, encoder_layers=1)
    model = ParallelTTSModel(params, rngs=nnx.Rngs(0))
    inputs = _inputs(rng)
    if enc == "ling_condition":
        inputs = __import__("dataclasses").replace(
            inputs,
            ling_feat=jnp.asarray(rng.normal(size=(B, N, 56)).astype(np.float32)),
            lm_feat=jnp.asarray(rng.normal(size=(B, N, 32)).astype(np.float32)))
    out = model(inputs, training=True)
    assert out.spectrogram.shape == (2, B, T, MELS)
    assert np.isfinite(np.asarray(out.spectrogram)).all()


@pytest.mark.parametrize("enc", ["dummy", "cnn", "rnn", "dit", "vq",
                                 "variance_encoder"])
@pytest.mark.slow
def test_registry_encoders_in_model(rng, enc):
    """Every remaining TTS_ENCODERS entry runs inside ParallelTTSModel
    (reachability: no registry entry exists only as a standalone unit)."""
    params = _params(encoder_type=enc, encoder_layers=1)
    model = ParallelTTSModel(params, rngs=nnx.Rngs(0))
    out = model(_inputs(rng), training=True)
    assert out.spectrogram.shape == (2, B, T, MELS)
    assert np.isfinite(np.asarray(out.spectrogram)).all()
    if enc == "vq":
        # the VQ bottleneck's commitment loss must reach the criterion
        assert "encoder_vq_loss" in out.additional_losses
        assert np.isfinite(float(out.additional_losses["encoder_vq_loss"]))


@pytest.mark.slow
def test_gmvae_style_encoder(rng):
    """GMVAE style bottleneck (reference: style_encoder.py:141): losses
    present at train time, deterministic at inference, prior sampling works,
    and the model integrates it."""
    import jax
    from speechflow_tpu.models.tts.predictors import GaussianMixtureVAE

    gm = GaussianMixtureVAE(24, 8, n_components=4, rngs=nnx.Rngs(0))
    pooled = jnp.asarray(rng.normal(size=(3, 24)).astype(np.float32))
    z, losses = gm(pooled, deterministic=False)
    assert z.shape == (3, 8)
    assert np.isfinite(float(losses["gmvae_gm"]))
    assert float(losses["gmvae_cat"]) >= -1e-4  # KL to uniform is nonnegative
    z_det, l_det = gm(pooled, deterministic=True)
    assert l_det == {}
    np.testing.assert_array_equal(np.asarray(gm(pooled, True)[0]), np.asarray(z_det))
    s = gm.sample_prior(jax.random.PRNGKey(0), n=5)
    assert s.shape == (5, 8) and np.isfinite(np.asarray(s)).all()

    params = _params(use_style_encoder=True, style_use_gmvae=True,
                     style_gmvae_components=4, style_emb_dim=16)
    model = ParallelTTSModel(params, rngs=nnx.Rngs(0))
    out = model(_inputs(rng), training=True)
    assert "gmvae_gm" in out.additional_losses
    assert "gmvae_cat" in out.additional_losses


@pytest.mark.slow
def test_condition_sources_lookup_and_detach(rng):
    """Multi-source condition lookup (reference: component.py:149
    get_condition): named sources + '<detach' modifier; detached sources
    receive no gradient."""
    import jax

    params = _params(condition_sources=("speaker", "speech_quality_emb<detach"),
                     speaker_emb_dim=32, dropout=0.0)
    model = ParallelTTSModel(params, rngs=nnx.Rngs(0))
    inputs = __import__("dataclasses").replace(
        _inputs(rng),
        speech_quality_emb=jnp.asarray(rng.normal(size=(B, 5)).astype(np.float32)))
    out = model(inputs, training=True)
    assert out.spectrogram.shape == (2, B, T, MELS)

    # detach semantics: gradient through the detached source is exactly zero
    def g_of(name):
        def f(q):
            inp = __import__("dataclasses").replace(inputs, speech_quality_emb=q)
            v = model._lookup_condition(name, inp, False, {})
            return jnp.sum(v**2)

        return jax.grad(f)(inputs.speech_quality_emb)

    assert float(jnp.abs(g_of("speech_quality_emb<detach")).max()) == 0.0
    assert float(jnp.abs(g_of("speech_quality_emb")).max()) > 0.0

    # and the model still trains through the non-detached sources
    import optax

    opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    def loss_fn(m):
        return jnp.mean(m(inputs, training=True).spectrogram ** 2)

    before = np.asarray(model.speaker_emb.embedding[...]).copy()
    loss, grads = nnx.value_and_grad(loss_fn)(model)
    opt.update(model, grads)
    after = np.asarray(model.speaker_emb.embedding[...])
    assert not np.allclose(before, after)  # speaker table received gradient


def test_remat_encoder_parity(rng):
    """use_remat (jax.checkpoint per block) must not change outputs or
    gradients — only the autodiff memory/recompute tradeoff."""
    import jax
    from speechflow_tpu.models.tts.encoders import TransformerEncoder

    x = jnp.asarray(rng.normal(size=(2, 24, 32)).astype(np.float32))
    lens = jnp.asarray([24, 18], jnp.int32)

    def build(remat):
        return TransformerEncoder(dim_in=32, dim_out=32, dim=32, n_layers=2,
                                  n_heads=2, dropout=0.0, use_remat=remat,
                                  rngs=nnx.Rngs(0))

    e0, e1 = build(False), build(True)
    y0 = e0(x, lens, deterministic=True)
    y1 = e1(x, lens, deterministic=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-6)

    def loss(enc):
        return jnp.sum(enc(x, lens, deterministic=True) ** 2)

    g0 = nnx.grad(loss)(e0)
    g1 = nnx.grad(loss)(e1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        if hasattr(a, "shape"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_multi_stream_content_routing(rng):
    """Multi-stream content (reference: ComponentInput content lists +
    hierarchical_va.py input_content/cat_to_content routing): ContextEncoder
    emits separate streams; each variance reads from and conditions its
    configured stream; durations regulate every stream."""
    from speechflow_tpu.models.tts.variance_adaptor import (
        HierarchicalVarianceAdaptor,
        VarianceConfig,
    )

    # VA-level: pitch on stream 0, energy read from stream 1 but cat to both
    va = HierarchicalVarianceAdaptor(
        [24, 16],
        [VarianceConfig(name="aggregate_pitch", input_stream=0),
         VarianceConfig(name="aggregate_energy", input_stream=1,
                        cat_to_streams=(0, 1)),
         VarianceConfig(name="durations", input_stream=0)],
        max_output_length=T, rngs=nnx.Rngs(0))
    # stream dims: s0 = 24 +1(pitch) +1(energy) = 26; s1 = 16 +1(energy) = 17
    assert va.dim_out == 26 + 17
    inputs = _inputs(rng)
    s0 = jnp.asarray(rng.normal(size=(B, N, 24)).astype(np.float32))
    s1 = jnp.asarray(rng.normal(size=(B, N, 16)).astype(np.float32))
    x, out_lens, preds, attn, losses = va(
        [s0, s1], inputs.transcription_lengths, inputs, T, training=True)
    assert x.shape == (B, T, 43)
    assert set(preds) >= {"aggregate_pitch", "aggregate_energy", "durations"}

    # model-level: context encoder with concat=False
    params = _params(encoder_type="context", encoder_concat_streams=False,
                     encoder_sub_types=("cnn", "rnn"),
                     variances=(
                         {"name": "aggregate_pitch", "input_stream": 0},
                         {"name": "aggregate_energy", "input_stream": 1},
                         {"name": "durations"},
                     ))
    model = ParallelTTSModel(params, rngs=nnx.Rngs(0))
    out = model(_inputs(rng), training=True)
    assert out.spectrogram.shape == (2, B, T, MELS)
    assert np.isfinite(np.asarray(out.spectrogram)).all()
    inf = model.inference(_inputs(rng), t_out=T)
    assert np.isfinite(np.asarray(inf.spectrogram)).all()

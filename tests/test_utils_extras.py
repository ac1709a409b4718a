"""Utils parity tests: dictutils, plotting, versioning, checkpoint pruning,
embedding handlers, TTSFeatures E2E wiring, triplet sampler, prompt collate."""

import numpy as np
import pytest
from flax import nnx


def test_dictutils():
    from speechflow_tpu.utils.dictutils import deep_update, flatten_dict, unflatten_dict

    d = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = flatten_dict(d)
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}
    assert unflatten_dict(flat) == d
    assert deep_update({"a": {"b": 1}}, {"a": {"c": 2}}) == {"a": {"b": 1, "c": 2}}


def test_plotting():
    from speechflow_tpu.utils.plotting import plot_1d_overlay, plot_spectrogram

    img = plot_spectrogram(np.random.default_rng(0).normal(size=(40, 20)))
    assert img.ndim == 3 and img.shape[2] == 3
    img2 = plot_1d_overlay({"pitch": np.arange(50.0)})
    assert img2.ndim == 3


def test_tpu_info_and_versioning():
    import jax

    from speechflow_tpu.utils.misc import tpu_info, version_check

    info = tpu_info()
    assert len(info) >= 1 and "platform" in info[0]
    assert version_check(jax, "0.4.0")
    assert not version_check(jax, "999.0.0")


def test_prune_checkpoint(tmp_path):
    from speechflow_tpu.training import ExperimentSaver, OptimizerConfig, Trainer, TrainerConfig
    from speechflow_tpu.utils.misc import prune_checkpoint
    from tests.test_training import TinyModel, SyntheticLoader, _criterion, _batch_proc

    saver = ExperimentSaver(tmp_path, dump_sources=False)
    tr = Trainer(TinyModel(), _criterion, _batch_proc, OptimizerConfig(lr=1e-3),
                 TrainerConfig(max_steps=3), saver=saver)
    for _ in range(3):
        tr.training_step(SyntheticLoader().next_batch())
    ck = tr.save_checkpoint()
    slim = prune_checkpoint(ck, tmp_path / "slim")
    tree, payload = ExperimentSaver.load_checkpoint(slim)
    assert "opt" not in tree and "model" in tree


def test_embedding_handlers(rng):
    from speechflow_tpu.data.core.datasample import AudioDataSample
    from speechflow_tpu.data.processors import embeddings as emb_mod
    from speechflow_tpu.data.processors.embeddings import (
        codec_features,
        set_biometric_model,
        speech_quality,
        ssl_features,
        voice_biometrics,
    )
    from speechflow_tpu.io import AudioChunk

    wav = rng.normal(size=24000).astype(np.float32) * 0.3
    ds = AudioDataSample(audio_chunk=AudioChunk(data=wav, sr=24000))
    ds = voice_biometrics(ds)
    assert ds.speaker_emb.shape == (192,)
    assert abs(np.linalg.norm(ds.speaker_emb) - 1.0) < 1e-3
    # deterministic: same audio -> same embedding
    ds2 = voice_biometrics(AudioDataSample(audio_chunk=AudioChunk(data=wav, sr=24000)))
    assert np.allclose(ds.speaker_emb, ds2.speaker_emb)
    ds = ssl_features(ds)
    assert ds.ssl_feat.ndim == 2
    ds = speech_quality(ds)
    assert ds.speech_quality_emb.shape == (5,)
    ds = codec_features(ds)
    assert ds.ac_feat.ndim == 2
    # hook injection wins
    set_biometric_model(lambda w, sr: np.ones(8, np.float32))
    try:
        ds3 = voice_biometrics(AudioDataSample(audio_chunk=AudioChunk(data=wav, sr=24000)))
        assert ds3.speaker_emb.shape == (8,)
    finally:
        emb_mod._MODELS.pop("biometric", None)


@pytest.mark.slow
def test_ecapa_embedder(rng):
    import jax.numpy as jnp

    from speechflow_tpu.models.biometric import ECAPAEmbedder, ECAPAParams

    m = ECAPAEmbedder(ECAPAParams(n_mels=40, channels=32, emb_dim=32, n_blocks=2),
                      rngs=nnx.Rngs(0))
    mel = np.random.default_rng(0).normal(size=(3, 60, 40)).astype(np.float32)
    emb = m(jnp.asarray(mel), jnp.asarray([60, 40, 20]))
    assert emb.shape == (3, 32)
    assert np.allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-4)


def test_triplet_sampler():
    from speechflow_tpu.data.core import DataSample, Dataset
    from speechflow_tpu.data.samplers import TripletSampler

    samples = []
    for spk in ("a", "b", "c"):
        for i in range(4):
            s = DataSample(label=f"{spk}{i}", index=i)
            s.speaker_name = spk
            samples.append(s)
    ts = TripletSampler().set_dataset(Dataset(samples))
    out, _ = ts.sampling(5)
    assert len(out) == 15
    anchors, pos, neg = out[:5], out[5:10], out[10:]
    for a, p, n in zip(anchors, pos, neg):
        assert a.speaker_name == p.speaker_name
        assert a.speaker_name != n.speaker_name
        assert a.label != p.label


def test_prompt_collate(rng):
    from speechflow_tpu.data.collate import TTSCollateWithPrompt
    from speechflow_tpu.data.core.datasample import TTSDataSample

    samples = []
    for i, spk in enumerate([0, 0, 1, 1]):
        samples.append(TTSDataSample(
            transcription=rng.integers(1, 20, size=(8 + i,)).astype(np.int32),
            mel=rng.normal(size=(30 + i, 16)).astype(np.float32),
            speaker_id=spk, index=i))
    out = TTSCollateWithPrompt(token_multiple=4, frame_multiple=8)(samples)
    idx = out.additional["prompt_index"]
    # prompts pair within the same speaker, never self when a partner exists
    assert idx[0] == 1 and idx[1] == 0 and idx[2] == 3 and idx[3] == 2
    assert out.additional["prompt_mel"].shape == out.mel.shape


def test_tts_features_e2e(rng):
    from speechflow_tpu.models.tts import ParallelTTSParams
    from speechflow_tpu.models.vocoder.tts_features import TTSFeatures
    from tests.test_tts_model import _inputs

    p = ParallelTTSParams.create(n_symbols=60, n_speakers=4, n_mels=40,
                                 encoder_dim=48, encoder_layers=1, decoder_dim=48,
                                 decoder_layers=1, token_emb_dim=48,
                                 speaker_emb_dim=16, postnet_dim=48,
                                 max_output_length=64)
    tf = TTSFeatures(p, rngs=nnx.Rngs(0))
    mel, ft_losses, aux = tf(_inputs(rng))
    assert mel.shape[-1] == 40
    assert any(k.startswith("ft_") for k in ft_losses)
    for v in ft_losses.values():
        assert np.isfinite(float(v))
    # NSF feed: frame-level pitch expanded through the LR attention
    assert "pitch" in aux and aux["pitch"].shape[0] == mel.shape[0]


@pytest.mark.slow
def test_e2e_vocoder_gan_step(rng):
    """StyleTTS2-like wiring (SURVEY §A.5): ParallelTTSModel inside the Vocos
    generator; ft_ losses merge into the GAN objective; one GAN step runs."""
    import jax.numpy as jnp

    from speechflow_tpu.models.vocoder import (
        Vocos,
        VocosParams,
        VocoderDiscriminator,
        vocoder_disc_criterion,
        vocoder_gen_criterion,
    )
    from speechflow_tpu.models.vocoder.tts_features import E2EBatchProcessor
    from speechflow_tpu.training import GANTrainer, OptimizerConfig, TrainerConfig
    from tests.test_tts_model import _inputs

    hop = 256
    tts_inp = _inputs(rng)  # 64 frames, 40 mels
    wav = rng.normal(size=(2, 64 * hop)).astype(np.float32) * 0.2
    p = VocosParams.create(dict(
        feature_extractor="tts", n_mels=40, dim=48, n_layers=1, head="istft",
        n_fft=512, hop_length=hop,
        tts_params=dict(n_symbols=60, n_speakers=4, encoder_dim=48,
                        encoder_layers=1, decoder_dim=48, decoder_layers=1,
                        token_emb_dim=48, speaker_emb_dim=16, postnet_dim=48,
                        max_output_length=64)))
    gen = Vocos(p, rngs=nnx.Rngs(0))
    disc = VocoderDiscriminator(periods=(2,), resolutions=((512, 128),),
                                channels=4, rngs=nnx.Rngs(1))
    gan = GANTrainer(gen, disc,
                     vocoder_gen_criterion(24000, n_mels=40, adv_start_iter=0),
                     vocoder_disc_criterion(),
                     lambda b: b,  # batch already prepared below
                     config=TrainerConfig(max_steps=2, log_every=10**9))
    inputs = {"tts_inputs": tts_inp, "waveform": jnp.asarray(wav)}
    metrics = gan.training_step((inputs, {"waveform": jnp.asarray(wav)}))
    assert any(k.startswith("gen/ft_") for k in metrics), metrics.keys()
    assert "gen/mel" in metrics and "disc/disc_hinge" in metrics
    for v in metrics.values():
        assert np.isfinite(v)


def test_trained_ecapa_checkpoint_feeds_handler_and_tts(rng, tmp_path):
    """VERDICT item 7: the framework-trained ECAPA is the default fed-through
    speaker-conditioning path. Train briefly on the mini corpus, save with
    state_io, point voice_biometrics at the checkpoint, and condition a
    multi-speaker ParallelTTSModel on the resulting embeddings."""
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from speechflow_tpu.data.core.datasample import AudioDataSample
    from speechflow_tpu.data.processors import np_dsp
    from speechflow_tpu.data.processors.embeddings import voice_biometrics
    from speechflow_tpu.io import AudioChunk
    from speechflow_tpu.models.biometric import ECAPAEmbedder, ECAPAParams
    from speechflow_tpu.models.biometric.ecapa import triplet_loss
    from speechflow_tpu.utils.state_io import load_module, save_module

    # tiny embedder, a few triplet steps on synthetic two-speaker data
    params = ECAPAParams(n_mels=32, channels=16, emb_dim=16, n_blocks=1)
    model = ECAPAEmbedder(params, rngs=nnx.Rngs(0))
    opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

    def fake_mel(f0, seed):
        r = np.random.default_rng(seed)
        t = np.arange(24000) / 24000
        wav = np.sin(2 * np.pi * f0 * t) * 0.4 + 0.02 * r.standard_normal(24000)
        mag = np_dsp.magnitude_np(wav.astype(np.float32), 1024, 256)
        return np_dsp.amp_to_db_np(np_dsp.linear_to_mel_np(mag, 24000, 32))

    @nnx.jit
    def step(model, opt, mel):
        def loss_fn(m):
            emb = m(mel)
            a, p_, n = jnp.split(emb, 3, axis=0)
            return triplet_loss(a, p_, n)

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    for i in range(4):
        mel = np.stack([fake_mel(150, i), fake_mel(150, i + 100), fake_mel(320, i)])
        step(model, opt, jnp.asarray(mel))

    ckpt = tmp_path / "ecapa.pkl"
    save_module(model, params, ckpt)
    reloaded, _ = load_module(ECAPAEmbedder, ECAPAParams, ckpt)
    mel = jnp.asarray(fake_mel(200, 0)[None])
    np.testing.assert_allclose(np.asarray(model(mel)), np.asarray(reloaded(mel)),
                               rtol=1e-5)

    # handler path: checkpoint-first (no set_biometric_model registered)
    def make_ds(f0, seed):
        r = np.random.default_rng(seed)
        t = np.arange(24000) / 24000
        wav = (np.sin(2 * np.pi * f0 * t) * 0.4
               + 0.02 * r.standard_normal(24000)).astype(np.float32)
        return AudioDataSample(audio_chunk=AudioChunk(data=wav, sr=24000))

    ds_a = voice_biometrics(make_ds(150, 1), model_ckpt=str(ckpt))
    ds_b = voice_biometrics(make_ds(320, 2), model_ckpt=str(ckpt))
    assert ds_a.speaker_emb.shape == (16,)  # model emb_dim, not the 192 fallback
    assert np.isfinite(ds_a.speaker_emb).all()
    assert not np.allclose(ds_a.speaker_emb, ds_b.speaker_emb)

    # multi-speaker TTS conditions on the real embeddings (speaker_emb_mode=input)
    from speechflow_tpu.models.tts import ParallelTTSModel, ParallelTTSParams
    from speechflow_tpu.models.tts.data_types import TTSForwardInput

    tp_ = ParallelTTSParams.create(dict(
        n_symbols=30, n_mels=20, encoder_dim=32, encoder_layers=1,
        decoder_dim=32, decoder_layers=1, token_emb_dim=32, postnet_dim=32,
        speaker_emb_mode="input", speaker_bio_dim=16, speaker_emb_dim=16,
        max_output_length=32, variances=()))
    tts = ParallelTTSModel(tp_, rngs=nnx.Rngs(0))
    base = dict(
        transcription=jnp.asarray(rng.integers(1, 30, (1, 8)), jnp.int32),
        transcription_lengths=jnp.asarray([8], jnp.int32),
        speaker_id=jnp.zeros((1,), jnp.int32), lang_id=jnp.zeros((1,), jnp.int32))
    out_a = tts.inference(TTSForwardInput(
        speaker_emb=jnp.asarray(ds_a.speaker_emb[None]), **base), t_out=32)
    out_b = tts.inference(TTSForwardInput(
        speaker_emb=jnp.asarray(ds_b.speaker_emb[None]), **base), t_out=32)
    assert np.isfinite(np.asarray(out_a.spectrogram)).all()
    # different speaker embeddings must change the generated spectrogram
    assert not np.allclose(np.asarray(out_a.spectrogram), np.asarray(out_b.spectrogram))

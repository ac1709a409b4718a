"""Golden/numeric tests for the device DSP kernels (speechflow_tpu.ops).

STFT parity vs torch.stft; mel/dB/normalize invertibility and mel-scale
anchor values; ISTFT round trip; YIN accuracy on synthetic tones; length
regulators vs a repeat oracle; MAS vs a brute-force numpy DP oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from speechflow_tpu import ops
from speechflow_tpu.ops.mel import _hz_to_mel, _mel_to_hz, mel_filterbank
from tests.paths import MINI_SEGS


def _rand_wav(rng, n=24000):
    return rng.normal(size=n).astype(np.float32) * 0.3


# ------------------------------------------------------------------ STFT


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 256, 1024), (2048, 512, 1200), (512, 128, 512)])
def test_stft_matches_torch(rng, n_fft, hop, win):
    wav = _rand_wav(rng)
    ours = np.asarray(ops.stft(jnp.asarray(wav)[None], n_fft, hop, win))  # (1, T, F)
    ref = torch.stft(
        torch.from_numpy(wav)[None],
        n_fft, hop, win,
        window=torch.hann_window(win, periodic=True),
        center=True, pad_mode="reflect", return_complex=True,
    ).numpy()  # (1, F, T)
    ref = np.swapaxes(ref, 1, 2)
    assert ours.shape == ref.shape
    denom = np.abs(ref).max()
    assert np.abs(ours - ref).max() / denom < 1e-4


def test_magnitude_layout(rng):
    wav = _rand_wav(rng, 4096)
    mag = np.asarray(ops.magnitude(jnp.asarray(wav)[None], 1024, 256))
    assert mag.shape == (1, 4096 // 256 + 1, 513)
    assert (mag >= 0).all()


def test_istft_roundtrip(rng):
    wav = _rand_wav(rng, 8192)
    spec = ops.stft(jnp.asarray(wav)[None], 1024, 256)
    back = np.asarray(ops.istft(spec, 1024, 256, length=8192))[0]
    assert np.abs(back - wav).max() < 1e-4


# ------------------------------------------------------------------ mel


def test_mel_scale_anchor_values():
    # Slaney: 1000 Hz -> 15.0 mel exactly; linear below 1 kHz
    assert abs(float(_hz_to_mel(np.array(1000.0))) - 15.0) < 1e-9
    assert abs(float(_hz_to_mel(np.array(500.0))) - 7.5) < 1e-9
    # HTK: mel(700*9) = 2595 (log10(10))
    assert abs(float(_hz_to_mel(np.array(6300.0), htk=True)) - 2595.0) < 1e-6
    # inverses
    for htk in (False, True):
        f = np.array([0.0, 123.0, 1000.0, 4000.0, 11025.0])
        assert np.allclose(_mel_to_hz(_hz_to_mel(f, htk), htk), f, atol=1e-6)


def test_mel_filterbank_structure():
    fb = mel_filterbank(24000, 1024, 100)
    assert fb.shape == (100, 513)
    assert (fb >= 0).all()
    # every filter has some support, peaks move monotonically with index
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum(axis=1).min() > 0
    # slaney normalization: filters scaled by 2/bandwidth -> higher filters smaller peak
    assert fb.max(axis=1)[0] > fb.max(axis=1)[-1]


def test_amp_db_normalize_inverses(rng):
    mag = np.abs(rng.normal(size=(3, 50, 513))).astype(np.float32) + 1e-4
    mel = ops.linear_to_mel(jnp.asarray(mag), sr=24000, n_mels=80)
    db = ops.amp_to_db(mel)
    assert float(jnp.max(db)) <= 30
    back = ops.db_to_amp(db)
    clipped = jnp.clip(mel, 1e-5, None)
    assert float(jnp.abs(back - clipped).max() / jnp.abs(clipped).max()) < 1e-5
    norm = ops.normalize_mel(db)
    assert float(jnp.min(norm)) >= -4.0
    denorm = ops.denormalize_mel(norm)
    assert float(jnp.abs(denorm - db).max()) < 1e-4


def test_mel_to_linear_pinv(rng):
    mag = np.abs(rng.normal(size=(2, 40, 513))).astype(np.float32)
    mel = ops.linear_to_mel(jnp.asarray(mag), sr=24000, n_mels=80)
    rec = ops.mel_to_linear(mel, sr=24000, n_fft=1024)
    assert rec.shape == mag.shape
    assert (np.asarray(rec) >= 0).all()


# ------------------------------------------------------------------ signal


@pytest.mark.slow
def test_preemphasis_inverse(rng):
    wav = jnp.asarray(_rand_wav(rng, 4000))
    pre = ops.preemphasis(wav, 0.97)
    back = ops.deemphasis(pre, 0.97)
    assert float(jnp.abs(back - wav).max()) < 1e-3


def test_energy_and_flatness(rng):
    mag = jnp.abs(jnp.asarray(rng.normal(size=(2, 30, 513)).astype(np.float32)))
    e = ops.energy(mag)
    assert e.shape == (2, 30)
    assert np.allclose(np.asarray(e), np.linalg.norm(np.asarray(mag), axis=-1), atol=1e-4)
    fl = ops.spectral_flatness(mag)
    assert fl.shape == (2, 30)
    assert (np.asarray(fl) >= 0.0099).all() and (np.asarray(fl) <= 1.0).all()


def test_mu_law_roundtrip(rng):
    wav = jnp.asarray(rng.uniform(-1, 1, 1000).astype(np.float32))
    enc = ops.mu_law_encode(wav)
    dec = ops.mu_law_decode(enc)
    assert float(jnp.abs(dec - wav).max()) < 2e-2


def test_rms_normalize(rng):
    wav = jnp.asarray(_rand_wav(rng, 16000)) * 0.01
    out = ops.rms_normalize(wav, target_dbfs=-23.0)
    rms_db = 20 * np.log10(np.sqrt(np.mean(np.asarray(out) ** 2)))
    assert abs(rms_db - (-23.0)) < 0.5


# ------------------------------------------------------------------ pitch


def _tone(freq, sr=24000, dur=1.0, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
def test_yin_pure_tone(freq):
    sr = 24000
    wav = _tone(freq, sr)
    f0 = np.asarray(ops.yin_f0(jnp.asarray(wav)[None], sr, hop_length=256))[0]
    mid = f0[10:-10]
    voiced = mid[mid > 0]
    assert len(voiced) > 0.9 * len(mid)
    assert np.abs(voiced - freq).max() / freq < 0.01


def test_yin_silence_and_noise(rng):
    sr = 24000
    sil = np.zeros(sr, np.float32)
    f0 = np.asarray(ops.yin_f0(jnp.asarray(sil)[None], sr))[0]
    assert (f0 == 0).all()


def test_yin_batch_and_framecount():
    sr = 24000
    wavs = np.stack([_tone(150, sr), _tone(300, sr)])
    f0 = np.asarray(ops.yin_f0(jnp.asarray(wavs), sr, hop_length=256))
    assert f0.shape == (2, sr // 256 + 1)
    assert abs(np.median(f0[0][f0[0] > 0]) - 150) < 3
    assert abs(np.median(f0[1][f0[1] > 0]) - 300) < 5


# ------------------------------------------------------------------ length regulators


def test_length_regulate_hard_matches_repeat(rng):
    b, n, d = 2, 5, 3
    durs = rng.integers(1, 4, size=(b, n))
    content = rng.normal(size=(b, n, d)).astype(np.float32)
    t_out = int(durs.sum(axis=1).max())
    out, attn = ops.length_regulate_hard(jnp.asarray(content), jnp.asarray(durs), t_out)
    for i in range(b):
        oracle = np.repeat(content[i], durs[i], axis=0)
        got = np.asarray(out[i][: len(oracle)])
        assert np.allclose(got, oracle, atol=1e-6)
    assert np.asarray(attn).sum() == durs.sum()


def test_length_regulate_soft_close_to_hard(rng):
    b, n, d = 1, 6, 4
    durs = rng.integers(2, 6, size=(b, n)).astype(np.float32)
    content = rng.normal(size=(b, n, d)).astype(np.float32)
    t_out = int(durs.sum())
    hard, _ = ops.length_regulate_hard(jnp.asarray(content), jnp.asarray(durs), t_out)
    soft, attn = ops.length_regulate_soft(jnp.asarray(content), jnp.asarray(durs), t_out, sigma=4.0)
    assert np.allclose(np.asarray(attn).sum(axis=-1), 1.0, atol=1e-5)
    # correlation between soft and hard expansions should be high
    h, s = np.asarray(hard).ravel(), np.asarray(soft).ravel()
    corr = np.corrcoef(h, s)[0, 1]
    assert corr > 0.8


def test_length_regulate_soft_differentiable(rng):
    durs = jnp.asarray(rng.uniform(1, 4, size=(1, 5)).astype(np.float32))
    content = jnp.asarray(rng.normal(size=(1, 5, 2)).astype(np.float32))

    def loss(d):
        out, _ = ops.length_regulate_soft(content, d, 16)
        return jnp.sum(out**2)

    g = jax.grad(loss)(durs)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


# ------------------------------------------------------------------ MAS


def _mas_oracle(value, tx, ty):
    """Brute-force O(Tx*Ty) DP identical in spirit to glow-tts maximum_path."""
    NEG = -1e9
    q = np.full((tx, ty), NEG)
    q[0, 0] = value[0, 0]
    for j in range(1, ty):
        for i in range(min(j + 1, tx)):
            best = q[i, j - 1]
            if i > 0:
                best = max(best, q[i - 1, j - 1])
            q[i, j] = value[i, j] + best
    # backtrace
    path = np.zeros((tx, ty))
    i = tx - 1
    for j in range(ty - 1, -1, -1):
        path[i, j] = 1
        if j > 0 and i > 0 and q[i - 1, j - 1] > q[i, j - 1]:
            i -= 1
    return path, q[tx - 1, ty - 1]


def test_mas_matches_oracle(rng):
    b, tx, ty = 4, 7, 13
    value = rng.normal(size=(b, tx, ty)).astype(np.float32)
    txs = rng.integers(2, tx + 1, size=b).astype(np.int32)
    tys = np.array([max(int(t), int(x) + 1) for t, x in zip(rng.integers(5, ty + 1, size=b), txs)], np.int32)
    path = np.asarray(ops.maximum_path(jnp.asarray(value), jnp.asarray(txs), jnp.asarray(tys)))
    for k in range(b):
        oracle_path, oracle_score = _mas_oracle(value[k], txs[k], tys[k])
        got_score = (path[k] * value[k]).sum()
        # same optimal score (paths may differ on exact ties)
        assert abs(got_score - oracle_score) < 1e-3, (k, got_score, oracle_score)
        # structural checks: one text index per valid frame, monotonic, endpoints
        seg = path[k][:, : tys[k]]
        assert np.allclose(seg.sum(axis=0), 1.0)
        idx = seg.argmax(axis=0)
        assert (np.diff(idx) >= 0).all() and (np.diff(idx) <= 1).all()
        assert idx[0] == 0 and idx[-1] == txs[k] - 1
        # padding region empty
        assert path[k][:, tys[k]:].sum() == 0
        assert path[k][txs[k]:, :].sum() == 0


def test_mas_prefers_diagonal():
    # strong diagonal likelihood -> near-diagonal path
    tx, ty = 10, 20
    ii, jj = np.meshgrid(np.arange(tx), np.arange(ty), indexing="ij")
    value = -np.abs(ii * 2 - jj).astype(np.float32)
    path = np.asarray(ops.maximum_path(jnp.asarray(value)[None]))[0]
    idx = path.argmax(axis=0)
    assert np.abs(idx - np.arange(ty) // 2).max() <= 1


def test_mas_durations_sum():
    rng = np.random.default_rng(3)
    value = rng.normal(size=(2, 5, 12)).astype(np.float32)
    path = np.asarray(ops.maximum_path(jnp.asarray(value)))
    durs = path.sum(axis=-1)
    assert (durs.sum(axis=-1) == 12).all()
    assert (durs >= 1).all()  # every token covered when ty >= tx


def test_pitch_cross_method_parity_synthetic():
    """YIN vs the independent ACF tracker (np_dsp.acf_f0_np, a dio/RAPT-class
    stand-in) must agree on a vibrato tone — two independent methods closing
    on the same contour is the offline pyworld-parity evidence."""
    from speechflow_tpu.data.processors.np_dsp import acf_f0_np, yin_f0_np

    sr = 24000
    t = np.arange(sr * 2) / sr
    f0_true = 180 + 30 * np.sin(2 * np.pi * 1.5 * t)  # vibrato 150..210 Hz
    phase = 2 * np.pi * np.cumsum(f0_true) / sr
    wav = (0.4 * np.sin(phase)).astype(np.float32)

    yin = yin_f0_np(wav, sr)
    acf = acf_f0_np(wav, sr)
    assert len(yin) == len(acf)
    both = (yin > 0) & (acf > 0)
    assert both.mean() > 0.8  # both track most frames
    rel = np.abs(yin[both] - acf[both]) / acf[both]
    assert np.median(rel) < 0.02, float(np.median(rel))
    # and both track the truth
    truth = f0_true[np.minimum(np.arange(len(yin)) * 256, len(t) - 1)]
    assert np.median(np.abs(acf[both] - truth[both]) / truth[both]) < 0.05


@pytest.mark.slow
def test_pitch_cross_method_parity_real_audio():
    """Cross-method agreement on the reference corpus audio."""
    import glob

    from speechflow_tpu.data.processors.np_dsp import acf_f0_np, yin_f0_np
    from speechflow_tpu.io import AudioChunk

    paths = sorted(glob.glob(
        f"{MINI_SEGS}/**/*.wav",
        recursive=True))[:3]
    if not paths:
        pytest.skip("reference mini dataset unavailable")
    agree = []
    for p in paths:
        wav = AudioChunk(file_path=p).load(sr=24000).waveform
        yin = yin_f0_np(wav, 24000)
        acf = acf_f0_np(wav, 24000)
        both = (yin > 0) & (acf > 0)
        if both.sum() < 10:
            continue
        rel = np.abs(yin[both] - acf[both]) / acf[both]
        # octave errors differ between methods; median is the robust statistic
        agree.append(float(np.median(rel)))
    assert agree and np.median(agree) < 0.05, agree


# ------------------------------------------------------- depthwise conv


@pytest.mark.parametrize("k", [3, 6, 7])
def test_depthwise_conv1d_matches_grouped_conv(rng, k):
    """The shifted-add depthwise conv (what ConvNeXt/Conformer blocks run on
    TPU) must be numerically identical to the grouped-conv formulation whose
    parameters it consumes."""
    from flax import nnx

    from speechflow_tpu.ops.signal import depthwise_conv1d

    b, t, c = 2, 50, 16
    x = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    conv = nnx.Conv(c, c, (k,), feature_group_count=c, padding="SAME",
                    rngs=nnx.Rngs(3))
    ref = conv(x)
    got = depthwise_conv1d(x, conv.kernel[...], conv.bias[...])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_depthwise_conv1d_bf16_drift_bounded(rng):
    """Under mixed precision the shifted-add form accumulates in bf16 while
    the grouped conv it replaced accumulates in fp32 on TPU; pin that the
    bf16 drift vs an fp32 accumulation stays within bf16 rounding (~1e-2
    relative at K<=7 taps) so a regression to larger error is caught."""
    from speechflow_tpu.ops.signal import depthwise_conv1d

    b, t, c, k = 2, 200, 32, 7
    x32 = jnp.asarray(rng.normal(size=(b, t, c)).astype(np.float32))
    kern32 = jnp.asarray(rng.normal(size=(k, c)).astype(np.float32) / k)
    ref = np.asarray(depthwise_conv1d(x32, kern32))
    got = np.asarray(depthwise_conv1d(x32.astype(jnp.bfloat16),
                                      kern32.astype(jnp.bfloat16))
                     .astype(jnp.float32))
    denom = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / denom < 2e-2

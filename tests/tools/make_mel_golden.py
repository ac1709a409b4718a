"""One-time generator for the committed mel-parity golden file.

Reproduces the reference MelProcessor chain
(speechflow/data_pipeline/datasample_processors/spectrogram_processors.py:
magnitude :182 -> linear_to_mel :411 -> amp_to_db :519 -> normalize :573)
with an INDEPENDENT oracle: torch.stft for the framing/FFT (librosa-equivalent:
centered reflect pad, periodic hann) and a float64 slaney mel filterbank
implemented directly from librosa.filters.mel's published formula — no
speechflow_tpu code is imported, so the golden is a true external reference.

Input: the 24 kHz LJSpeech wav committed with the reference mini dataset
(the reference uses exactly these wavs for its debug/smoke configs).
Output: tests/data/mel_golden_reference.npz

Run: python tests/tools/make_mel_golden.py
"""

from pathlib import Path

import numpy as np
import torch
from tests.paths import SRC_ROOT

WAV = (f"{SRC_ROOT}/EN/OPENSOURCE_VOICES/"
       "001_LJSpeech/LJSpeech-1.1/wavs/LJ001-0002.wav")
OUT = Path(__file__).resolve().parents[1] / "data" / "mel_golden_reference.npz"

SR = 24000
N_FFT, HOP, WIN = 1024, 256, 1024           # tts_data_24khz.yml:80-82
N_MELS, F_MIN, F_MAX = 100, 0.0, None       # tts_data_24khz.yml:89 (fmax -> sr/2)
A_MIN, MULTIPLIER = 1e-5, 1.0               # amp_to_db defaults (:522-523)
MAX_ABS_VALUE = 4.0                         # normalize default (:576)


def hz_to_mel(f, htk=False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = f >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz(m, htk=False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = m >= min_log_mel
    return np.where(log_t, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def slaney_mel_fbank(sr, n_fft, n_mels, fmin, fmax):
    """librosa.filters.mel(norm='slaney', htk=False) from its published formula."""
    fmax = fmax or sr / 2.0
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, len(fftfreqs)), dtype=np.float64)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights


def main():
    from scipy.io import wavfile

    sr, pcm = wavfile.read(WAV)
    assert sr == SR and pcm.dtype == np.int16
    wav = pcm.astype(np.float64) / 32768.0  # librosa.load float scaling

    # magnitude (reference :182): |librosa.stft|.T  == |torch.stft| with
    # center=True, reflect pad, periodic hann
    x = torch.from_numpy(wav)
    window = torch.hann_window(WIN, periodic=True, dtype=torch.float64)
    stft = torch.stft(x, N_FFT, HOP, WIN, window=window, center=True,
                      pad_mode="reflect", return_complex=True)
    magnitude = stft.abs().numpy().T            # (T, n_fft//2+1)

    energy = np.linalg.norm(magnitude, axis=-1)  # reference :242

    # linear_to_mel (:411): mel_basis @ magnitude.T, slaney norm
    fb = slaney_mel_fbank(SR, N_FFT, N_MELS, F_MIN, F_MAX)
    mel = (fb @ magnitude.T).T                   # (T, n_mels)

    # amp_to_db (:519): ln(clip(mel, 1e-5)); min_level_db = multiplier*ln(a_min)
    mel_db = np.log(np.clip(mel, A_MIN, None)) * MULTIPLIER
    min_level_db = MULTIPLIER * np.log(A_MIN)

    # normalize (:573)
    mel_norm = np.clip(
        (2 * MAX_ABS_VALUE) * ((mel_db - min_level_db) / (-min_level_db)) - MAX_ABS_VALUE,
        -MAX_ABS_VALUE, None)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        OUT,
        wav=wav.astype(np.float32),
        magnitude=magnitude.astype(np.float32),
        energy=energy.astype(np.float32),
        mel_db=mel_db.astype(np.float32),
        mel_norm=mel_norm.astype(np.float32),
        params=np.array([SR, N_FFT, HOP, WIN, N_MELS], dtype=np.int64),
        min_level_db=np.float64(min_level_db),
        max_abs_value=np.float64(MAX_ABS_VALUE),
    )
    print(f"wrote {OUT}: mag {magnitude.shape}, mel {mel_norm.shape}, "
          f"min_level_db={min_level_db:.6f}")


if __name__ == "__main__":
    main()

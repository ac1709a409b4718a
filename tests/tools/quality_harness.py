"""Round-over-round TTS quality harness (VERDICT r2 next-step #6).

Shared by tests/test_quality_ratchet.py (asserts the trend) and the updater
below (records a better result into the committed ratchet JSON).  The
procedure is fully deterministic: train the flagship debug config for a fixed
step budget on the mini corpus, resynthesize held corpus utterances through
the checkpoint-rebuilt eval interface, and score the predicted mel against
the pipeline's ground-truth mel.

Metrics:
  * mel_l1  — masked mean |pred - target| in normalized-mel units
  * mcd_db  — MCD-style spectral distance: mean per-frame Euclidean over the
    dB-scaled mel, x 10*sqrt(2)/ln(10) (the usual MCD constant; computed on
    mel rather than true cepstra — stable, oracle-free, and comparable
    round to round)

Waveform-level periodicity/SI-SNR live in the vocoder GAN validation metrics
(models/vocoder/metrics.py) — this harness pins the acoustic model.

Update the committed numbers (only when better) with:
  PYTHONPATH=. python tests/tools/quality_harness.py
"""

from __future__ import annotations

import dataclasses
import json
import typing as tp
from pathlib import Path

import numpy as np
from tests.paths import MINI_SEGS

REPO = Path(__file__).resolve().parent.parent.parent
RATCHET_PATH = REPO / "tests" / "data" / "quality_ratchet.json"
MINI = f"{MINI_SEGS}"
TRAIN_STEPS = 80


def train_ratchet_model(out_dir: Path) -> Path:
    """Flagship debug config, fixed TRAIN_STEPS budget; returns ckpt path."""
    from speechflow_tpu.io import Config
    from speechflow_tpu.scripts import train_tts
    from speechflow_tpu.training import ExperimentSaver

    cfg = Config.create_from_file(REPO / "configs" / "tts_model.yml",
                                  value_select=["debug"])
    cfg.set_path("experiment.base_dir", str(out_dir))
    cfg.set_path("trainer.max_steps", TRAIN_STEPS)
    cfg.set_path("trainer.ckpt_every", TRAIN_STEPS)
    cfg.set_path("trainer.val_every", TRAIN_STEPS)
    cfg.set_path("experiment.train_g2p", False)  # not needed for resynthesis
    mpath = out_dir / "tts_model.yml"
    cfg.to_file(mpath)
    exp = train_tts.main(["-c", str(mpath),
                          "-cd", str(REPO / "configs" / "tts_data_24khz.yml"),
                          "-vs", "debug", "--data_root", MINI])
    return ExperimentSaver.get_last_checkpoint(exp)


def _eval_mels(iface, sega_paths: tp.Sequence[Path], model=None):
    """[(pred_mel (T,M), target_mel (T,M), length)] via the eval interface's
    own pipeline; ``model`` overrides the interface's (untrained baseline).

    Teacher-forced (training=True: reference durations time-align prediction
    and target) and noise-free (deterministic=True) — free-running inference
    would measure duration-prediction drift, not spectral fit, and at debug
    budgets that drowns the trend this harness exists to track."""
    from speechflow_tpu.data.parsers import TTSDSParser

    pipe = iface._audio_pipe()
    model = model or iface.model
    out = []
    for p in sega_paths:
        ds = TTSDSParser().read_datasamples([str(p)])[0]
        ds.speaker_id = iface.speaker2id.get(ds.speaker_name, 0)
        ds.lang_id = iface.lang2id.get(ds.lang, 0)
        batch = pipe["train"].datasample_to_batch([ds])
        inputs, _ = iface.batch_processor(batch)
        t_out = int(inputs.mel.shape[1])
        res = model(inputs, training=True, t_out=t_out, deterministic=True)
        pred = np.asarray(res.after_postnet_spectrogram[0], np.float32)
        tgt = np.asarray(inputs.mel[0], np.float32)
        n = int(inputs.mel_lengths[0])
        out.append((pred[:n], tgt[:n], n))
    return out


def score(pairs) -> tp.Dict[str, float]:
    l1s, mcds = [], []
    for pred, tgt, n in pairs:
        l1s.append(float(np.abs(pred - tgt).mean()))
        # dB-scale distance with the MCD constant (mel-domain surrogate)
        d = np.sqrt(((pred - tgt) ** 2).sum(-1))
        mcds.append(float((10.0 * np.sqrt(2.0) / np.log(10.0)) * d.mean()))
    return {"mel_l1": round(float(np.mean(l1s)), 4),
            "mcd_db": round(float(np.mean(mcds)), 3)}


def eval_checkpoint(ckpt: Path, n_utts: int = 6):
    """-> (trained metrics, untrained-baseline metrics) on held utterances."""
    from flax import nnx

    from speechflow_tpu.interface import TTSEvaluationInterface
    from speechflow_tpu.models.tts import ParallelTTSModel, ParallelTTSParams

    iface = TTSEvaluationInterface(ckpt)
    segs = sorted((Path(MINI) / "EN").rglob("*.TextGridStage3"))[:n_utts]
    trained = score(_eval_mels(iface, segs))
    params = ParallelTTSParams.create(iface.payload["model_params"])
    untrained_model = ParallelTTSModel(params, rngs=nnx.Rngs(1234))
    untrained = score(_eval_mels(iface, segs, model=untrained_model))
    return trained, untrained


def main() -> None:
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ckpt = train_ratchet_model(Path(td))
        trained, untrained = eval_checkpoint(ckpt)
    print("trained:  ", trained)
    print("untrained:", untrained)
    prev = json.loads(RATCHET_PATH.read_text()) if RATCHET_PATH.exists() else None
    if prev is None or trained["mel_l1"] < prev["mel_l1"]:
        record = dict(trained, untrained_mel_l1=untrained["mel_l1"],
                      train_steps=TRAIN_STEPS)
        RATCHET_PATH.write_text(json.dumps(record, indent=2) + "\n")
        print("ratchet updated ->", RATCHET_PATH)
    else:
        print(f"no improvement over committed {prev['mel_l1']} — not updated")


if __name__ == "__main__":
    main()

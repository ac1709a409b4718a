"""Mini-convergence study (VERDICT r3 next-step #2).

The 80-step quality ratchet proves training *moves*; this study proves it
*converges*: a few-thousand-step run of the forward acoustic model and of the
mel->ISTFT GAN vocoder on the committed mini corpus, recording

  * the full training-loss trajectory (sampled every ``SAMPLE_EVERY`` steps),
  * teacher-forced mel-L1 / MCD for the acoustic model (same metrics as the
    ratchet harness) plus a NON-teacher-forced synthesis metric — DTW-aligned
    MCD of free-running inference against the corpus mel,
  * GAN validation metrics (MCD / SI-SNR / periodicity / wideband PESQ)
    before training, right before the adversarial phase starts, and at the
    end — covering the "does GAN training stay stable past warmup" question.

The committed record (docs/convergence.json) is gated by
tests/test_convergence_record.py: loss curves must actually decay, the
adversarial phase must not destabilize reconstruction, and end-of-run values
ratchet (reruns that regress past tolerance fail the gate).

Reference anchor: the debug configs' full-loop smoke philosophy (SURVEY §4);
the reference trains these exact recipes for 0.5-5M steps
(cfm_bigvgan.yml / mel_bigvgan.yml:26) — this is the scaled-down, measured
version of the same loop.

Run (writes docs/convergence.json):
  PYTHONPATH=. python tests/tools/convergence_study.py
"""

from __future__ import annotations

import json
import sys
import time
import typing as tp
from pathlib import Path

import numpy as np
from tests.paths import MINI_SEGS

REPO = Path(__file__).resolve().parent.parent.parent
if str(REPO) not in sys.path:  # runnable as a script from anywhere
    sys.path.insert(0, str(REPO))
RECORD_PATH = REPO / "docs" / "convergence.json"
MINI = f"{MINI_SEGS}"

ACOUSTIC_STEPS = 3000
VOCODER_STEPS = 2500
VOCODER_ADV_START = 800   # reconstruction-only warmup, then adversarial
SAMPLE_EVERY = 25


# --------------------------------------------------------------------------- #
#  trajectory callback                                                        #
# --------------------------------------------------------------------------- #


class LossTrace:
    """fit() callback: record float(metrics[key]) every ``every`` steps.

    The float() call forces the lazy device scalar — sampling (not every
    step) keeps the host from serializing with TPU compute."""

    def __init__(self, keys: tp.Sequence[str], every: int = SAMPLE_EVERY):
        self.keys = list(keys)
        self.every = every
        self.rows: tp.List[tp.List[float]] = []

    def __call__(self, trainer, last: dict) -> None:
        s = int(trainer.global_step)
        if s % self.every:
            return
        row = [float(s)]
        for k in self.keys:
            v = last.get(k)
            row.append(float(v) if v is not None else float("nan"))
        self.rows.append(row)


# --------------------------------------------------------------------------- #
#  DTW-aligned MCD (the non-teacher-forced synthesis metric)                  #
# --------------------------------------------------------------------------- #


def dtw_mcd(pred: np.ndarray, tgt: np.ndarray) -> float:
    """MCD-style distance after DTW alignment, per aligned step.

    Free-running inference drifts in time against the reference (duration
    prediction is part of what's being scored), so frame-wise distance is
    meaningless; DTW recovers the monotone alignment first.  Same distance +
    constant as quality_harness.score, averaged along the optimal path."""
    C = np.sqrt(((pred[:, None, :] - tgt[None, :, :]) ** 2).sum(-1))
    n, m = C.shape
    D = np.full((n + 1, m + 1), np.inf, np.float64)
    L = np.zeros((n + 1, m + 1), np.int32)
    D[0, 0], L[0, 0] = 0.0, 0
    for i in range(1, n + 1):
        Ci = C[i - 1]
        Di, Dp = D[i], D[i - 1]
        Li, Lp = L[i], L[i - 1]
        for j in range(1, m + 1):
            best = Dp[j - 1]; path = Lp[j - 1]          # diagonal
            if Dp[j] < best:
                best, path = Dp[j], Lp[j]               # insertion
            if Di[j - 1] < best:
                best, path = Di[j - 1], Li[j - 1]       # deletion
            Di[j] = best + Ci[j - 1]
            Li[j] = path + 1
    const = 10.0 * np.sqrt(2.0) / np.log(10.0)
    return float(const * D[n, m] / max(int(L[n, m]), 1))


# --------------------------------------------------------------------------- #
#  acoustic study                                                             #
# --------------------------------------------------------------------------- #


def run_acoustic(out_dir: Path, steps: int = ACOUSTIC_STEPS) -> dict:
    import quality_harness as qh

    from speechflow_tpu.io import Config
    from speechflow_tpu.scripts import train_tts
    from speechflow_tpu.scripts.common import config_prepare, train_arguments
    from speechflow_tpu.training import ExperimentSaver

    cfg = Config.create_from_file(REPO / "configs" / "tts_model.yml",
                                  value_select=["debug"])
    cfg.set_path("experiment.base_dir", str(out_dir))
    cfg.set_path("batch.size", 8)
    cfg.set_path("trainer.max_steps", steps)
    cfg.set_path("trainer.ckpt_every", steps)
    cfg.set_path("trainer.val_every", 10 ** 9)
    cfg.set_path("optimizer.lr_schedule_kwargs.warmup_steps",
                 max(min(100, steps // 10), 1))
    cfg.set_path("optimizer.lr_schedule_kwargs.decay_steps", steps)
    cfg.set_path("experiment.train_g2p", False)
    out_dir.mkdir(parents=True, exist_ok=True)
    mpath = out_dir / "tts_model.yml"
    cfg.to_file(mpath)

    cfg.set_path("data_loaders.n_workers", 4)  # YIN/feature prep off the hot path
    cfg.to_file(mpath)
    args = train_arguments().parse_args(
        ["-c", str(mpath), "-cd", str(REPO / "configs" / "tts_data_24khz.yml"),
         "-vs", "debug", "--data_root", MINI])
    model_cfg, data_cfg, saver = config_prepare(args)
    trace = LossTrace(["total_loss", "spectral"])
    t0 = time.time()
    exp = train_tts.train(model_cfg, data_cfg, saver, callbacks=[trace])
    train_s = time.time() - t0

    ckpt = ExperimentSaver.get_last_checkpoint(exp)
    trained, untrained = qh.eval_checkpoint(ckpt)

    # non-teacher-forced: free-running inference, DTW-aligned MCD
    from speechflow_tpu.interface import TTSEvaluationInterface

    iface = TTSEvaluationInterface(ckpt)
    segs = sorted((Path(MINI) / "EN").rglob("*.TextGridStage3"))[:6]
    pairs = qh._eval_mels(iface, segs)  # (pred_tf, target, n) — reuse targets
    free_mcds = []
    for p, (_, tgt, n) in zip(segs, pairs):
        out = iface.resynthesize(p)
        pred = np.asarray(out.after_postnet_spectrogram[0], np.float32)
        free_mcds.append(dtw_mcd(pred, tgt[:n]))
    return {
        "steps": steps,
        "train_seconds": round(train_s, 1),
        "steps_per_s": round(steps / train_s, 2),
        "loss_keys": trace.keys,
        "loss_curve": [[round(v, 4) for v in row] for row in trace.rows],
        "tf": trained,
        "tf_untrained": untrained,
        "free_running_mcd_dtw": round(float(np.mean(free_mcds)), 3),
    }


# --------------------------------------------------------------------------- #
#  vocoder study                                                              #
# --------------------------------------------------------------------------- #


def run_vocoder(out_dir: Path, steps: int = VOCODER_STEPS,
                adv_start: int = VOCODER_ADV_START) -> dict:
    from flax import nnx

    from speechflow_tpu.io import Config
    from speechflow_tpu.models.vocoder import (
        Vocos,
        VocoderBatchProcessor,
        VocoderDiscriminator,
        VocosParams,
        vocoder_disc_criterion,
        vocoder_gen_criterion,
    )
    from speechflow_tpu.scripts.common import build_data
    from speechflow_tpu.training import GANTrainer
    from speechflow_tpu.training.optimizer import OptimizerConfig
    from speechflow_tpu.training.trainer import TrainerConfig
    from speechflow_tpu.utils.init import filter_kwargs

    model_cfg = Config.create_from_file(REPO / "configs" / "vocoder_model.yml",
                                        value_select=["debug"])
    # study dims: bigger than the 6-step smoke, far below production
    model_cfg.set_path("model.dim", 128)
    model_cfg.set_path("model.n_layers", 4)
    model_cfg.set_path("batch.size", 8)
    model_cfg.set_path("loss.adv_start_iter", adv_start)
    data_cfg = Config.create_from_file(
        REPO / "configs" / "vocoder_data_24khz.yml", value_select=["debug"])
    data_cfg.set_path("dirs.data_root", MINI)

    pipeline, bundle = build_data(data_cfg, model_cfg)
    try:
        params = VocosParams.create(model_cfg.section("model").to_dict())
        generator = Vocos(params, rngs=nnx.Rngs(0))
        disc_cfg = model_cfg.section("discriminator").to_dict()
        discriminator = VocoderDiscriminator(
            **filter_kwargs(VocoderDiscriminator.__init__, disc_cfg),
            rngs=nnx.Rngs(1))
        loss_cfg = model_cfg.section("loss").to_dict()
        gen_crit = vocoder_gen_criterion(
            sample_rate=params.sample_rate, n_mels=params.n_mels,
            **filter_kwargs(vocoder_gen_criterion, loss_cfg))
        gan = GANTrainer(
            generator, discriminator, gen_crit, vocoder_disc_criterion(),
            VocoderBatchProcessor(),
            gen_optimizer=OptimizerConfig(lr=2e-4),
            disc_optimizer=OptimizerConfig(lr=2e-4),
            config=TrainerConfig(max_steps=steps, log_every=250,
                                 ckpt_every=10 ** 9, val_every=10 ** 9,
                                 val_batches=2),
            disc_every=1,
            disc_start_iter=adv_start,
            evaluate_pesq=True,
        )
        val = bundle.loaders.get("test") or bundle["train"]

        untrained = gan.validate(val)
        trace = LossTrace(["gen/total", "gen/mel", "disc/total"])
        t0 = time.time()

        def until(n):
            gan.cfg.max_steps = n
            gan.fit(bundle["train"], callbacks=[trace])

        until(adv_start)
        at_adv_start = gan.validate(val)
        until(steps)
        train_s = time.time() - t0
        final = gan.validate(val)
        return {
            "steps": steps,
            "adv_start_iter": adv_start,
            "train_seconds": round(train_s, 1),
            "steps_per_s": round(steps / train_s, 2),
            "loss_keys": trace.keys,
            "loss_curve": [[round(v, 4) for v in row] for row in trace.rows],
            "val_untrained": {k: round(v, 4) for k, v in untrained.items()},
            "val_at_adv_start": {k: round(v, 4) for k, v in at_adv_start.items()},
            "val_final": {k: round(v, 4) for k, v in final.items()},
        }
    finally:
        bundle.shutdown()


def main() -> None:
    import sys
    import tempfile

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    record = json.loads(RECORD_PATH.read_text()) if RECORD_PATH.exists() else {}
    with tempfile.TemporaryDirectory() as td:
        if which in ("all", "acoustic"):
            record["acoustic"] = run_acoustic(Path(td) / "acoustic")
            print("acoustic:", {k: v for k, v in record["acoustic"].items()
                                if k != "loss_curve"})
        if which in ("all", "vocoder"):
            record["vocoder"] = run_vocoder(Path(td) / "vocoder")
            print("vocoder:", {k: v for k, v in record["vocoder"].items()
                               if k != "loss_curve"})
    record["corpus"] = MINI
    RECORD_PATH.write_text(json.dumps(record, indent=1) + "\n")
    print("record ->", RECORD_PATH)


if __name__ == "__main__":
    import logging

    logging.basicConfig(level=logging.INFO)
    main()

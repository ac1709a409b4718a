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

REPO = Path(__file__).resolve().parent.parent.parent
if str(REPO) not in sys.path:  # runnable as a script from anywhere
    sys.path.insert(0, str(REPO))

from tests.paths import MINI_SEGS  # noqa: E402  (needs the sys.path bootstrap)

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
    }, str(exp)


# --------------------------------------------------------------------------- #
#  vocoder study                                                              #
# --------------------------------------------------------------------------- #


def run_vocoder(out_dir: Path, steps: int = VOCODER_STEPS,
                adv_start: int = VOCODER_ADV_START,
                disc_head_start: int = 300,
                adv_ramp_steps: int = 400) -> tp.Tuple[dict, str]:
    """-> (record, experiment path with the final checkpoint).

    Adversarial-phase schedule (r4 VERDICT weak #2 fix): the discriminator
    starts ``disc_head_start`` steps BEFORE the generator's adversarial term
    so its gradient means something when it first reaches the generator, and
    the adv/FM weights ramp linearly over ``adv_ramp_steps`` instead of
    switching on — with the r4 hard gate, val/pesq_wb fell 1.50 -> 1.47
    across the adversarial phase."""
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
    from speechflow_tpu.training import ExperimentSaver, GANTrainer
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
    model_cfg.set_path("loss.adv_ramp_steps", adv_ramp_steps)
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
        saver = ExperimentSaver(out_dir, dump_sources=False)
        saver.to_save["pipeline_info"] = pipeline.get_info()
        saver.to_save["model_params"] = params.to_dict()
        gan = GANTrainer(
            generator, discriminator, gen_crit, vocoder_disc_criterion(),
            VocoderBatchProcessor(),
            gen_optimizer=OptimizerConfig(lr=2e-4),
            disc_optimizer=OptimizerConfig(lr=2e-4),
            config=TrainerConfig(max_steps=steps, log_every=250,
                                 ckpt_every=10 ** 9, val_every=10 ** 9,
                                 val_batches=6),
            saver=saver,
            disc_every=1,
            disc_start_iter=max(adv_start - disc_head_start, 0),
            evaluate_pesq=True,
        )
        val = bundle.loaders.get("test") or bundle["train"]

        untrained = gan.validate(val)
        trace = LossTrace(["gen/total", "gen/mel", "disc/total"])
        t0 = time.time()

        def until(n):
            gan.cfg.max_steps = n
            gan.fit(bundle["train"], callbacks=[trace])

        # fit() checkpoints at the end of each segment: the early/pre-adv/
        # final generators double as the GAN-artifact grades for the
        # MOS-proxy-vs-PESQ probe (run_mos_gan_probe)
        until(min(100, adv_start))
        until(adv_start)
        at_adv_start = gan.validate(val)
        until(steps)
        train_s = time.time() - t0
        final = gan.validate(val)
        return {
            "steps": steps,
            "adv_start_iter": adv_start,
            "disc_head_start": disc_head_start,
            "adv_ramp_steps": adv_ramp_steps,
            "train_seconds": round(train_s, 1),
            "steps_per_s": round(steps / train_s, 2),
            "loss_keys": trace.keys,
            "loss_curve": [[round(v, 4) for v in row] for row in trace.rows],
            "val_untrained": {k: round(v, 4) for k, v in untrained.items()},
            "val_at_adv_start": {k: round(v, 4) for k, v in at_adv_start.items()},
            "val_final": {k: round(v, 4) for k, v in final.items()},
        }, str(saver.expr_path)
    finally:
        bundle.shutdown()


# --------------------------------------------------------------------------- #
#  composed chain: text/seg -> acoustic -> vocoder -> wave vs ground truth    #
# --------------------------------------------------------------------------- #


def run_composed(acoustic_exp: str, vocoder_exp: str, n_utts: int = 6) -> dict:
    """Score the FULL synthesis chain against ground-truth audio (r4 VERDICT
    weak #6: "the pipeline synthesizes" vs "synthesizes something good").

    Two compositions:

    - teacher-forced: GT durations time-align the predicted mel with the
      target, so acoustic(mel) -> vocoder(wave) is sample-comparable to the
      corpus wave — scored with wideband PESQ + time-aligned MCD.
    - free-running: ``resynthesize`` predicts its own durations; scored with
      DTW-aligned MCD of the synthesized wave's mel vs the corpus mel, plus
      the reference-free MOS proxy (trained on the same corpus's GT waves,
      with GT waves' own score recorded as the anchor).
    """
    import quality_harness as qh

    from speechflow_tpu.interface import (
        TTSEvaluationInterface,
        VocoderEvaluationInterface,
    )
    from speechflow_tpu.io.seg import AudioSeg
    from speechflow_tpu.models.vocoder.mos_proxy import MOSProxyHook, train_mos_proxy
    from speechflow_tpu.models.vocoder.pesq import pesq_wb
    from speechflow_tpu.training import ExperimentSaver

    iface = TTSEvaluationInterface(ExperimentSaver.get_last_checkpoint(acoustic_exp))
    voc = VocoderEvaluationInterface(ExperimentSaver.get_last_checkpoint(vocoder_exp))
    sr = voc.sample_rate
    segs = sorted((Path(MINI) / "EN").rglob("*.TextGridStage3"))[:n_utts]
    gt_waves = [np.asarray(AudioSeg.load(p).audio_chunk.load(sr=sr).waveform,
                           np.float32) for p in segs]

    # ---- teacher-forced composition: PESQ + aligned MCD vs GT wave ---------
    pairs = qh._eval_mels(iface, segs)
    pesqs, mcds = [], []
    for (pred, tgt, n), gt in zip(pairs, gt_waves):
        wav = np.asarray(voc.synthesize(pred).waveform, np.float32)
        t = min(len(wav), len(gt))
        pesqs.append(pesq_wb(gt[:t], wav[:t], sr))
        mcds.append(dtw_mcd(pred, tgt))
    tf_metrics = {"pesq_wb": round(float(np.mean(pesqs)), 4),
                  "mcd_dtw": round(float(np.mean(mcds)), 3)}

    # ---- free-running composition: MCD-DTW + MOS proxy ---------------------
    mos = MOSProxyHook(train_mos_proxy(gt_waves, sr=sr, steps=200))
    free_mcds, mos_free, mos_gt = [], [], []
    for p, (_, tgt, n), gt in zip(segs, pairs, gt_waves):
        out = iface.resynthesize(p)
        pred = np.asarray(out.after_postnet_spectrogram[0], np.float32)
        wav = np.asarray(voc.synthesize(pred).waveform, np.float32)
        free_mcds.append(dtw_mcd(pred, tgt[:n]))
        mos_free.append(mos(wav, sr))
        mos_gt.append(mos(gt, sr))
    return {
        "n_utts": len(segs),
        "tf": tf_metrics,
        "free_running": {
            "mcd_dtw": round(float(np.mean(free_mcds)), 3),
            "mos_proxy": round(float(np.mean(mos_free)), 4),
            "mos_proxy_gt_anchor": round(float(np.mean(mos_gt)), 4),
        },
    }


def run_mos_gan_probe(vocoder_exp: str, n_utts: int = 6) -> dict:
    """MOS-proxy vs PESQ on *GAN artifacts* (r4 VERDICT weak #5: the proxy's
    0.80 Spearman was measured on synthetic degradations, not on the thing it
    gates in validation).  Copy-synthesize held utterances through every
    checkpoint the study saved (early / pre-adversarial / final generator =
    three real GAN-artifact grades), score each wave with the in-repo P.862
    PESQ and with the MOS proxy, and report rank correlation across all
    (checkpoint x utterance) pairs."""
    from scipy import stats

    from speechflow_tpu.interface import VocoderEvaluationInterface
    from speechflow_tpu.io.audio import AudioChunk
    from speechflow_tpu.io.seg import AudioSeg
    from speechflow_tpu.models.vocoder.mos_proxy import MOSProxyHook, train_mos_proxy
    from speechflow_tpu.models.vocoder.pesq import pesq_wb

    ckpts = sorted((Path(vocoder_exp) / "checkpoints").glob("step_*"))
    segs = sorted((Path(MINI) / "EN").rglob("*.TextGridStage3"))[:n_utts]
    first = VocoderEvaluationInterface(ckpts[0])
    sr = first.sample_rate
    gt = [np.asarray(AudioSeg.load(p).audio_chunk.load(sr=sr).waveform,
                     np.float32) for p in segs]
    mos = MOSProxyHook(train_mos_proxy(gt, sr=sr, steps=200))

    pesqs, moss, by_ckpt = [], [], {}
    for c in ckpts:
        voc = first if c == ckpts[0] else VocoderEvaluationInterface(c)
        ck_p, ck_m = [], []
        for wav_gt in gt:
            out = np.asarray(voc.resynthesize(
                AudioChunk(data=wav_gt, sr=sr)).waveform, np.float32)
            t = min(len(out), len(wav_gt))
            ck_p.append(pesq_wb(wav_gt[:t], out[:t], sr))
            ck_m.append(float(mos(out, sr)))
        pesqs += ck_p
        moss += ck_m
        by_ckpt[c.name] = {"pesq_wb": round(float(np.mean(ck_p)), 4),
                           "mos_proxy": round(float(np.mean(ck_m)), 4)}
    rho, p = stats.spearmanr(pesqs, moss)
    return {"n_pairs": len(pesqs), "spearman": round(float(rho), 4),
            "p_value": float(f"{p:.2e}"), "by_checkpoint": by_ckpt}


def main() -> None:
    import sys
    import tempfile

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    def run_stages(td: Path) -> None:
        """Each stage persists its record section (and, with a persistent
        workdir, its experiment path) as soon as it finishes, so a crashed or
        preempted run can be resumed stage-by-stage."""
        record = json.loads(RECORD_PATH.read_text()) if RECORD_PATH.exists() else {}
        paths_file = td / "stage_paths.json"
        paths = (json.loads(paths_file.read_text())
                 if paths_file.exists() else {})

        def save() -> None:
            record["corpus"] = MINI
            RECORD_PATH.write_text(json.dumps(record, indent=1) + "\n")
            paths_file.write_text(json.dumps(paths, indent=1))

        if which in ("all", "acoustic"):
            record["acoustic"], paths["acoustic"] = run_acoustic(td / "acoustic")
            print("acoustic:", {k: v for k, v in record["acoustic"].items()
                                if k != "loss_curve"})
            save()
        if which in ("all", "vocoder"):
            record["vocoder"], paths["vocoder"] = run_vocoder(td / "vocoder")
            print("vocoder:", {k: v for k, v in record["vocoder"].items()
                               if k != "loss_curve"})
            save()
        if which in ("all", "vocoder", "mosgan"):
            record["mos_gan_probe"] = run_mos_gan_probe(paths["vocoder"])
            print("mos_gan_probe:", record["mos_gan_probe"])
            save()
        if which in ("all", "composed"):  # needs both stage checkpoints
            record["composed"] = run_composed(paths["acoustic"], paths["vocoder"])
            print("composed:", record["composed"])
            save()
        print("record ->", RECORD_PATH)

    if len(sys.argv) > 2:  # persistent workdir: resumable across processes
        wd = Path(sys.argv[2])
        wd.mkdir(parents=True, exist_ok=True)
        run_stages(wd)
    else:
        with tempfile.TemporaryDirectory() as td:
            run_stages(Path(td))


if __name__ == "__main__":
    import logging

    logging.basicConfig(level=logging.INFO)
    main()

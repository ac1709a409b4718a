"""Dataset annotation pipeline CLI — the 5-step runner.

Capability parity with ``python -m annotator.runner`` (reference
annotator/runner.py:159, steps at :201-331):

  0) ASR transcription (.whisper sidecars; Whisper or precomputed files)
  1) seg generation (text<->ASR alignment -> utterance TextGrid+wav pairs)
  2) per-stage aligner training + alignment (stage 1, 2)
  3) seg correction with the stage-2 aligner -> .TextGridStage3
  4) dataset statistics

Usage:
  python -m speechflow_tpu.annotator.runner -d SRC_ROOT -o OUT_ROOT \
      [--aligner_config configs/aligner_model.yml] [-vs debug] [--steps 0 1 2 3 4]
"""

from __future__ import annotations

import argparse
import json
import logging
import typing as tp
from pathlib import Path

LOGGER = logging.getLogger("speechflow_tpu")


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--data_root", required=True)
    p.add_argument("-o", "--output_root", required=True)
    p.add_argument("--steps", nargs="*", type=int, default=[0, 1, 2, 3, 4])
    p.add_argument("--aligner_config", default="configs/aligner_model.yml")
    p.add_argument("--data_config", default=None,
                   help="override the per-stage aligner data config (default: "
                        "configs/aligner_data_stage{1,2}.yml per stage)")
    p.add_argument("--max_steps", type=int, default=None,
                   help="override aligner trainer.max_steps (both stages)")
    p.add_argument("-vs", "--value_select", nargs="*", default=["debug"])
    p.add_argument("--lang", default="EN")
    p.add_argument("--use_whisper", action="store_true",
                   help="run Whisper ASR instead of reading .whisper sidecars")
    p.add_argument("--asr", default=None,
                   help="ASR backend: 'file' (default), 'whisper', or "
                        "'ctc:<checkpoint.pkl>' (framework CTC recognizer)")
    args = p.parse_args(argv)

    data_root, out_root = Path(args.data_root), Path(args.output_root)
    out_root.mkdir(parents=True, exist_ok=True)
    report: dict = {}

    from speechflow_tpu.annotator.asr import (
        CTCPhonemeASR,
        FileASR,
        WhisperASR,
        run_audio_transcription,
    )
    from speechflow_tpu.annotator.seg_generator import SegGenerator

    asr_spec = args.asr or ("whisper" if args.use_whisper else "file")
    if asr_spec.startswith("ctc:"):
        asr = CTCPhonemeASR(asr_spec.split(":", 1)[1])
    elif asr_spec == "whisper":
        asr = WhisperASR()
    else:
        asr = FileASR()
    runs_asr = not isinstance(asr, FileASR)

    if 0 in args.steps:
        n = run_audio_transcription(data_root, asr=asr) if runs_asr else \
            len(list(Path(data_root).rglob("*.whisper")))
        report["transcribed"] = n
        LOGGER.info("step 0: %d transcripts", n)

    segs_root = out_root / "SEGS"
    if 1 in args.steps:
        gen = SegGenerator(asr=asr, lang=args.lang)
        paths = gen.run(data_root, segs_root)
        report["segs"] = len(paths)
        LOGGER.info("step 1: %d segs", len(paths))
    elif not segs_root.is_dir() and any(data_root.rglob("*.TextGrid")):
        # resuming from pre-generated segs: align in place under data_root
        segs_root = data_root

    # Step 2 is the 2-STAGE forced-alignment recipe (reference
    # annotator/runner.py:691-713, configs/2stage/data_stage{1,2}.yml):
    #   stage 1: train on raw .TextGrid segs (pauses from text punctuation,
    #            service tokens ON) -> align -> .TextGridStage1
    #   stage 2: train on the STAGE-1 OUTPUT (.TextGridStage1: pauses from
    #            stage-1 timestamps, anomalous-phoneme filter, service tokens
    #            OFF, warmstarted from the stage-1 checkpoint) -> align ->
    #            .TextGridStage2 with true inter-word SIL positions
    ckpts = {}
    if 2 in args.steps:
        from speechflow_tpu.scripts import train_aligner
        from speechflow_tpu.training import ExperimentSaver

        def _stage_data_cfg(stage: int) -> str:
            name = f"aligner_data_stage{stage}.yml"
            # next to the model config, then cwd configs/, then repo configs/
            for cand in (Path(args.aligner_config).parent / name,
                         Path("configs") / name,
                         Path(__file__).parents[2] / "configs" / name):
                if cand.exists():
                    return str(cand)
            raise FileNotFoundError(name)

        for stage in (1, 2):
            data_cfg = args.data_config or _stage_data_cfg(stage)
            train_args = [
                "-c", args.aligner_config, "-cd", data_cfg,
                "-vs", *args.value_select, "--data_root", str(segs_root),
            ]
            if args.max_steps:
                train_args += ["--max_steps", str(args.max_steps)]
            if stage == 2 and ckpts.get(1):
                # reference continues stage-2 training from the stage-1
                # experiment (runner.py:710 experiment_path ->
                # resume_from_checkpoint); weights carry over, the data
                # semantics change
                train_args += ["-w", str(ckpts[1])]
            exp = train_aligner.main(train_args)
            ckpts[stage] = ExperimentSaver.get_last_checkpoint(exp)
            from speechflow_tpu.annotator.align import Aligner, AlignStage

            aligner = Aligner(ckpts[stage])
            emitted = aligner.run(segs_root, AlignStage(stage))
            report[f"stage{stage}_aligned"] = len(emitted)
            LOGGER.info("step 2 stage %d: %d aligned", stage, len(emitted))

    if 3 in args.steps and ckpts.get(2):
        from speechflow_tpu.annotator.align import Aligner, AlignStage

        # stage-3 correction: the stage-2 model re-aligns the .TextGridStage2
        # grids, adding BOS/EOS silence annotation + last-token correction
        aligner = Aligner(ckpts[2])
        emitted = aligner.run(segs_root, AlignStage.stage3)
        report["stage3"] = len(emitted)
        LOGGER.info("step 3: %d corrected", len(emitted))

    if 4 in args.steps:
        from speechflow_tpu.io import AudioSeg, construct_file_list

        stats: tp.Dict[str, dict] = {}
        for f in construct_file_list(segs_root, ext=".TextGridStage3"):
            seg = AudioSeg.load(f)
            s = stats.setdefault(seg.speaker_name or "unknown",
                                 {"n": 0, "duration": 0.0})
            s["n"] += 1
            s["duration"] += seg.duration
        (out_root / "speaker_stats.json").write_text(json.dumps(stats, indent=2))
        report["speakers"] = stats
        LOGGER.info("step 4: stats for %d speakers", len(stats))

    (out_root / "annotation_report.json").write_text(json.dumps(report, indent=2, default=str))
    return report


def cli() -> None:
    """Console entry point (pyproject [project.scripts]): exit-code semantics
    want None, while :func:`main` returns its result for programmatic use."""
    main()


if __name__ == "__main__":
    main()

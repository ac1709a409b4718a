"""Apply a trained aligner to segas: MAS -> phoneme timestamps -> TextGridStage files.

Capability parity with the reference Aligner (annotator/align.py:106, stages
at :46; AnnotatorEvaluationInterface annotator/eval_interface.py:20): for each
utterance seg, run the full audio+text pipeline to build model inputs, get
MAS durations from the GlowTTS aligner, convert to per-token timestamps
(hop/sr scaling, x2 for the flow's time-squeeze), and write
``.TextGridStage{1,2,3}`` with phonemes/text tiers; stage 3 adds BOS/EOS
silence annotation and last-token correction.
"""

from __future__ import annotations

import enum
import typing as tp
from pathlib import Path

import numpy as np
from flax import nnx

from speechflow_tpu.data.core.components import DataPipeline
from speechflow_tpu.io import AudioSeg, TextGrid, Tier, Timestamps
from speechflow_tpu.models.aligner import AlignerBatchProcessor, GlowTTSAligner, GlowTTSParams
from speechflow_tpu.training import ExperimentSaver

__all__ = ["Aligner", "AlignStage"]


class AlignStage(enum.Enum):
    stage1 = 1
    stage2 = 2
    stage3 = 3


class Aligner:
    def __init__(self, ckpt_path: tp.Union[str, Path]):
        tree, payload = ExperimentSaver.load_checkpoint(ckpt_path)
        self.payload = payload
        info = payload["pipeline_info"]
        self.pipeline = DataPipeline.from_info(info)
        params = GlowTTSParams.create(payload["model_params"])
        self.model = GlowTTSAligner(params, rngs=nnx.Rngs(0))
        state = nnx.state(self.model, nnx.Not(nnx.RngState))
        nnx.replace_by_pure_dict(state, tree["model"])
        nnx.update(self.model, state)
        self.batch_processor = AlignerBatchProcessor()
        cfg = info["config"]
        self.hop = int(cfg.get("preproc", {}).get("pipe_cfg", {})
                       .get("magnitude", {}).get("hop_len", 256))
        self.sr = int(cfg.get("preproc", {}).get("pipe_cfg", {})
                      .get("load_audio", {}).get("sample_rate", 24000))

    # -- single seg ------------------------------------------------------------

    def align_seg(self, seg_path: tp.Union[str, Path],
                  stage: AlignStage = AlignStage.stage1) -> Path:
        seg = AudioSeg.load(seg_path)
        comp = self.pipeline[self.pipeline.subsets[0]]
        from speechflow_tpu.data.parsers import TTSDSParser

        parser: TTSDSParser = TTSDSParser()
        md = parser.reader(seg_path)[0]
        ds = parser.to_datasample(md)
        if ds.phonemes is None or not ds.phonemes:
            # stage-1 input: no phoneme tier yet; derive from the text tier
            from speechflow_tpu.data.processors.text import TextParserHook

            ds.phonemes = TextParserHook()(ds.text or "")
            ds.phoneme_timestamps = None
        batch = comp.datasample_to_batch([ds])
        inputs, _ = self.batch_processor(batch)
        durations, _ = self.model.align(inputs)
        durs = np.asarray(durations)[0]
        n_tok = int(np.asarray(inputs.transcription_lengths)[0])
        durs = durs[:n_tok]

        # frames (on the /2-squeezed grid x2 back) -> seconds
        spf = self.hop / self.sr
        token_ts = Timestamps.from_durations(durs * spf)
        # alphabet ids -> labels (skip BOS/EOS rows for the tier)
        symbols = self.pipeline.alphabet.decode(
            np.asarray(inputs.transcription)[0][:n_tok])
        return self._emit(seg, seg_path, symbols, token_ts, stage)

    def _emit(self, seg: AudioSeg, seg_path, symbols, token_ts: Timestamps,
              stage: AlignStage) -> Path:
        intervals = []
        dur_total = seg.duration
        for lab, (b, e) in zip(symbols, token_ts):
            if lab in ("<BOS>", "<EOS>", "<PAD>"):
                lab = ""
            elif lab == "<SIL>":
                lab = ""
            intervals.append((min(b, dur_total), min(e, dur_total), lab))
        if intervals and intervals[-1][1] < dur_total:
            b, e, lab = intervals[-1]
            if stage is AlignStage.stage3 and lab:
                # last-token correction: extend the final token to the audio end
                intervals[-1] = (b, dur_total, lab)
            else:
                intervals.append((intervals[-1][1], dur_total, ""))

        grid = seg.grid
        grid.add(Tier("phonemes", intervals))
        if stage is AlignStage.stage3:
            non_empty = [iv for iv in intervals if iv[2]]
            if non_empty:
                seg.meta["bos_label"] = ""
                seg.meta["eos_label"] = ""
                seg.meta["speech_begin"] = non_empty[0][0]
                seg.meta["speech_end"] = non_empty[-1][1]
        seg.meta["aligner_model"] = str(self.payload.get("git_commit", "speechflow_tpu"))
        out = Path(str(seg_path).split(".TextGrid")[0] + f".TextGridStage{stage.value}")
        seg.save(out)
        return out

    # -- batch over a tree ---------------------------------------------------------

    def run(self, segs_root: tp.Union[str, Path],
            stage: AlignStage = AlignStage.stage1, ext: str = ".TextGrid") -> tp.List[Path]:
        from speechflow_tpu.io import construct_file_list

        out = []
        for f in construct_file_list(segs_root, ext=ext):
            if ".TextGridStage" in f:
                continue
            try:
                out.append(self.align_seg(f, stage))
            except Exception as e:  # noqa: BLE001
                import logging

                logging.getLogger("speechflow_tpu").warning("align failed on %s: %r", f, e)
        return out

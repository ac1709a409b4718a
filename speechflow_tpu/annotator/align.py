"""Apply a trained aligner to segas: MAS -> phoneme timestamps -> TextGridStage files.

Capability parity with the reference Aligner (annotator/align.py:106, stages
at :46, batched model dispatch at :410-430, per-stage input ext at :476-480;
AnnotatorEvaluationInterface annotator/eval_interface.py:20):

  - stage 1 consumes the seg-generator's ``.TextGrid`` files (word tier only,
    phonemes from text), stage N>=2 consumes ``.TextGridStage{N-1}``;
  - each seg runs through the checkpoint's OWN data pipeline (so the
    per-stage pause semantics — pauses-from-text vs pauses-from-timestamps,
    service tokens on/off, strip pad — travel with the model);
  - alignment is BATCHED: segs are parsed, sorted by duration, and dispatched
    through one jitted ``model.align`` per bucketed batch (the reference
    amortizes via the data server, align.py:503; here the bucketed collate +
    a cached nnx.jit gives the same effect on device);
  - emitted timestamps are mapped back through the parser's audio_strip
    (reference ``aligned_timestamps += audio_chunk.begin``, align.py:389);
  - for stages >= 2 small pauses are removed (reference ``_remove_small_pauses``,
    min_pause_len 0.08 s default, align.py:116,378-380);
  - stage 3 adds BOS/EOS silence annotation + last-token correction
    (reference eval_interface.py:227-240).
"""

from __future__ import annotations

import enum
import logging
import typing as tp
from pathlib import Path

import numpy as np
from flax import nnx

from speechflow_tpu.data.core.components import DataPipeline
from speechflow_tpu.io import AudioSeg, Tier, Timestamps
from speechflow_tpu.models.aligner import AlignerBatchProcessor, GlowTTSAligner, GlowTTSParams
from speechflow_tpu.training import ExperimentSaver

__all__ = ["Aligner", "AlignStage"]

LOGGER = logging.getLogger("speechflow_tpu")


class AlignStage(enum.Enum):
    stage1 = 1
    stage2 = 2
    stage3 = 3

    @property
    def input_ext(self) -> str:
        """Which grids this stage aligns (reference align.py:476-480)."""
        if self is AlignStage.stage1:
            return ".TextGrid"
        return f".TextGridStage{self.value - 1}"


class Aligner:
    def __init__(self, ckpt_path: tp.Union[str, Path], batch_size: int = 16,
                 min_pause_len: float = 0.08):
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
        self.batch_size = batch_size
        self.min_pause_len = min_pause_len
        cfg = info["config"]
        self.hop = int(cfg.get("preproc", {}).get("pipe_cfg", {})
                       .get("magnitude", {}).get("hop_len", 256))
        self.sr = int(cfg.get("preproc", {}).get("pipe_cfg", {})
                      .get("load_audio", {}).get("sample_rate", 24000))
        self._jit_align = nnx.jit(type(self.model).align)

    # -- datasample construction ------------------------------------------------

    def _to_datasample(self, seg_path: tp.Union[str, Path]):
        """Parse one seg through the pipeline's OWN parser (strip pad,
        duration/phoneme-length filters all honored)."""
        comp = self.pipeline[self.pipeline.subsets[0]]
        parser = comp.parser
        md = parser.reader(seg_path)[0]
        md = parser.run_preprocessing(md)
        if md is None:
            return None
        return parser.to_datasample(md)

    # -- single seg --------------------------------------------------------------

    def align_seg(self, seg_path: tp.Union[str, Path],
                  stage: AlignStage = AlignStage.stage1) -> Path:
        out = self._align_batch([Path(seg_path)], stage)
        if not out:
            raise RuntimeError(f"alignment failed for {seg_path}")
        return out[0]

    # -- batched core --------------------------------------------------------------

    def _align_batch(self, seg_paths: tp.Sequence[Path],
                     stage: AlignStage) -> tp.List[Path]:
        comp = self.pipeline[self.pipeline.subsets[0]]
        samples, paths = [], []
        for p in seg_paths:
            try:
                ds = self._to_datasample(p)
            except Exception as e:  # noqa: BLE001
                LOGGER.warning("parse failed on %s: %r", p, e)
                continue
            if ds is None:
                LOGGER.info("seg filtered out by parser: %s", p)
                continue
            samples.append(ds)
            paths.append(p)
        if not samples:
            return []

        batch = comp.datasample_to_batch(samples)
        inputs, _ = self.batch_processor(batch)
        durations, _ = self._jit_align(self.model, inputs)
        durs = np.asarray(durations)
        tok_lens = np.asarray(inputs.transcription_lengths)
        trans = np.asarray(inputs.transcription)

        # batch.data_samples is the post-preproc list in collated order; map
        # each row back to its seg path via the sample itself (the processor
        # may drop corrupted samples, so indices need not match `paths`)
        processed = batch.data_samples or samples
        out: tp.List[Path] = []
        for i, ds in enumerate(processed):
            p = Path(getattr(ds, "sega_path", None) or ds.file_path)
            try:
                n_tok = int(tok_lens[i])
                symbols = self.pipeline.alphabet.decode(trans[i][:n_tok])
                spf = self.hop / self.sr
                token_ts = Timestamps.from_durations(durs[i][:n_tok] * spf)
                seg = AudioSeg.load(p)
                # inverse audio_strip: pipeline coordinates -> grid coordinates
                offset = 0.0
                if ds.audio_chunk is not None and seg.audio_chunk is not None:
                    offset = float((ds.audio_chunk.begin or 0.0)
                                   - (seg.audio_chunk.begin or 0.0))
                out.append(self._emit(seg, p, symbols, token_ts, stage, offset))
            except Exception as e:  # noqa: BLE001
                LOGGER.warning("emission failed on %s: %r", p, e)
        return out

    # -- emission ---------------------------------------------------------------

    def _emit(self, seg: AudioSeg, seg_path, symbols, token_ts: Timestamps,
              stage: AlignStage, offset: float = 0.0) -> Path:
        intervals: tp.List[tp.Tuple[float, float, str]] = []
        dur_total = seg.duration
        for lab, (b, e) in zip(symbols, token_ts):
            if lab in ("<BOS>", "<EOS>", "<PAD>", "<SIL>"):
                lab = ""
            b, e = b + offset, e + offset
            intervals.append((max(min(b, dur_total), 0.0),
                              max(min(e, dur_total), 0.0), lab))
        # leading gap from the strip offset becomes an explicit pause
        if intervals and intervals[0][0] > 1e-6:
            intervals.insert(0, (0.0, intervals[0][0], ""))
        if intervals and intervals[-1][1] < dur_total:
            b, e, lab = intervals[-1]
            if stage is AlignStage.stage3 and lab:
                # last-token correction: extend the final token to the audio end
                intervals[-1] = (b, dur_total, lab)
            else:
                intervals.append((intervals[-1][1], dur_total, ""))

        if stage is not AlignStage.stage1:
            intervals = self._remove_small_pauses(intervals, self.min_pause_len)

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

    @staticmethod
    def _remove_small_pauses(intervals: tp.List[tp.Tuple[float, float, str]],
                             min_len: float) -> tp.List[tp.Tuple[float, float, str]]:
        """Merge sub-``min_len`` pauses into the neighboring tokens, splitting
        the gap evenly (reference _remove_small_pauses, align.py:338-358) —
        except utterance-boundary pauses, which always survive."""
        out: tp.List[tp.List] = []
        n = len(intervals)
        for idx, (b, e, lab) in enumerate(intervals):
            is_pause = not lab
            is_edge = idx == 0 or idx == n - 1
            if is_pause and not is_edge and (e - b) < min_len and out:
                mid = 0.5 * (b + e)
                out[-1][1] = mid  # extend previous token to the midpoint
                # next token will start late; fix up when appended
                out.append([mid, mid, None])  # sentinel: swallow into next
                continue
            out.append([b, e, lab])
        merged: tp.List[tp.Tuple[float, float, str]] = []
        pending_start: tp.Optional[float] = None
        for b, e, lab in out:
            if lab is None:
                pending_start = b
                continue
            if pending_start is not None:
                b = pending_start
                pending_start = None
            merged.append((b, e, lab))
        return merged

    # -- batch over a tree ---------------------------------------------------------

    def run(self, segs_root: tp.Union[str, Path],
            stage: AlignStage = AlignStage.stage1,
            ext: tp.Optional[str] = None) -> tp.List[Path]:
        from speechflow_tpu.io import construct_file_list

        ext = ext or stage.input_ext
        files = [Path(f) for f in construct_file_list(segs_root, ext=ext)]
        if ext == ".TextGrid":
            files = [f for f in files if ".TextGridStage" not in f.name]
        # sort by file size (duration proxy) so bucketed batches pad less
        files.sort(key=lambda f: f.stat().st_size if f.exists() else 0)
        out: tp.List[Path] = []
        for i in range(0, len(files), self.batch_size):
            out.extend(self._align_batch(files[i:i + self.batch_size], stage))
        return out

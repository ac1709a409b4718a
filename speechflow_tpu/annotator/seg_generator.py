"""Utterance segmentation: long audio + text -> per-utterance AudioSegs.

Capability parity with the reference seg generation
(annotator/{seg_generator.py:114, audiobook_spliter.py:32,
simple_segmentation.py:26}): align the reference text (or ASR text) to ASR
word timestamps, split into sentences at terminal punctuation, group into
utterances bounded by ``max_duration``, and emit ``N.TextGrid`` + ``N.wav``
pairs with orig/text tiers and the reference meta dict.
"""

from __future__ import annotations

import re
import typing as tp
from pathlib import Path

from speechflow_tpu.annotator.asr import ASRBase, FileASR
from speechflow_tpu.annotator.text_alignment import align_words, tokenize_text
from speechflow_tpu.io import AudioChunk, AudioSeg, TextGrid, Tier

__all__ = ["SegGenerator"]

_SENT_END = re.compile(r"[.!?;]$")


class SegGenerator:
    def __init__(self, asr: tp.Optional[ASRBase] = None,
                 max_duration: float = 10.0, min_duration: float = 0.5,
                 pad_s: float = 0.1, lang: str = "EN",
                 speaker_name: tp.Optional[str] = None):
        self.asr = asr or FileASR()
        self.max_duration = max_duration
        self.min_duration = min_duration
        self.pad_s = pad_s
        self.lang = lang
        self.speaker_name = speaker_name

    # -- core -----------------------------------------------------------------

    def sentences_with_times(self, words: tp.List[tp.Tuple[str, float, float]]
                             ) -> tp.List[tp.List[tp.Tuple[str, float, float]]]:
        out, cur = [], []
        for w, b, e in words:
            cur.append((w, b, e))
            if _SENT_END.search(w):
                out.append(cur)
                cur = []
        if cur:
            out.append(cur)
        return out

    def group_utterances(self, sentences):
        """Greedy grouping of sentences under max_duration."""
        utts, cur = [], []
        for sent in sentences:
            b = cur[0][1] if cur else sent[0][1]
            e = sent[-1][2]
            if cur and (e - b) > self.max_duration:
                utts.append(cur)
                cur = list(sent)
            else:
                cur.extend(sent)
        if cur:
            utts.append(cur)
        return utts

    def process_file(self, audio_path: tp.Union[str, Path],
                     text: tp.Optional[str] = None,
                     out_dir: tp.Optional[tp.Union[str, Path]] = None,
                     start_index: int = 0) -> tp.List[Path]:
        audio_path = Path(audio_path)
        asr_out = self.asr(audio_path)
        if text is None:
            txt_file = audio_path.with_suffix(".txt")
            text = txt_file.read_text(encoding="utf-8").strip() if txt_file.exists() \
                else asr_out["text"]
        chunk_full = AudioChunk(file_path=audio_path)
        total = chunk_full.duration
        words = align_words(tokenize_text(text), asr_out["timestamps"], total)
        utts = self.group_utterances(self.sentences_with_times(words))

        out_dir = Path(out_dir or audio_path.parent / "SEGS")
        out_dir.mkdir(parents=True, exist_ok=True)
        paths = []
        n_utts = len(utts)
        for u, utt in enumerate(utts):
            b = max(0.0, utt[0][1] - self.pad_s)
            e = min(total, utt[-1][2] + self.pad_s)
            if e - b < self.min_duration:
                continue
            grid = TextGrid(0.0, e - b)
            text_iv = []
            last = 0.0
            for w, wb, we in utt:
                wb, we = max(wb - b, last), min(we - b, e - b)
                if wb > last:
                    text_iv.append((last, wb, ""))
                text_iv.append((wb, max(we, wb + 1e-3), w))
                last = max(we, wb + 1e-3)
            if last < e - b:
                text_iv.append((last, e - b, ""))
            grid.add(Tier("text", text_iv))
            grid.add(Tier("orig", [(0.0, e - b, " ".join(w for w, _, _ in utt))]))
            seg = AudioSeg(AudioChunk(file_path=audio_path, begin=b, end=e), grid)
            seg.meta = {
                "lang": self.lang,
                "speaker_name": self.speaker_name or audio_path.parent.name,
                "orig_audio_path": str(audio_path),
                "orig_audio_chunk": [b, e],
                "sent_position": ("first" if u == 0 else
                                  "last" if u == n_utts - 1 else "internal"),
            }
            out_file = out_dir / f"{start_index + len(paths)}.TextGrid"
            seg.audio_chunk.load()
            seg.meta["audio_chunk"] = [0.0, seg.audio_chunk.duration]
            seg.meta["audio_path"] = str(out_dir / f"{start_index + len(paths)}.wav")
            seg.save(out_file, with_audio=True)
            paths.append(out_file)
        return paths

    def run(self, data_root: tp.Union[str, Path], out_root: tp.Union[str, Path],
            ext: str = ".wav") -> tp.List[Path]:
        from speechflow_tpu.io import construct_file_list

        all_paths = []
        for f in construct_file_list(data_root, ext=ext):
            rel = Path(f).relative_to(data_root).parent
            out_dir = Path(out_root) / rel
            all_paths.extend(self.process_file(f, out_dir=out_dir,
                                               start_index=len(all_paths)))
        return all_paths

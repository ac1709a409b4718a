"""TTS inference SDK: rebuild everything from a checkpoint and synthesize.

Capability parity with the reference TTSEvaluationInterface
(tts/acoustic_models/interface/eval_interface.py:127): loads a checkpoint,
restores model params/weights and the *entire data pipeline* from the embedded
payload (pipeline_info with config/alphabet/singleton state), performs
eval-time pipeline surgery (text-only pipe — audio handlers dropped), and
exposes get_languages / get_speakers / prepare_text / split_sentences /
prepare_batch / evaluate / synthesize. ``TTSContext`` carries
speaker/style references; ``TTSOptions`` the sampling knobs.
"""

from __future__ import annotations

import dataclasses
import re
import typing as tp
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.data.core.components import DataPipeline
from speechflow_tpu.data.core.datasample import TTSDataSample
from speechflow_tpu.data.processors.text import TextParserHook, TTSTextProcessor
from speechflow_tpu.models.tts import (
    ParallelTTSModel,
    ParallelTTSParams,
    TTSBatchProcessor,
)
from speechflow_tpu.models.tts.data_types import TTSOutput
from speechflow_tpu.training import ExperimentSaver

__all__ = ["TTSEvaluationInterface", "TTSContext", "TTSOptions"]

AUDIO_HANDLERS = {
    "load_audio", "volume_normalize", "multiple_audio", "magnitude",
    "linear_to_mel", "amp_to_db", "normalize_mel", "energy", "pitch",
    "calc_durations", "aggregate_pitch", "aggregate_energy", "gate_target",
    "add_pauses_from_timestamps",
}


@dataclasses.dataclass
class TTSContext:
    lang: str = "EN"
    speaker_name: tp.Optional[str] = None
    speaker_id: int = 0
    lang_id: int = 0
    speaker_emb: tp.Optional[np.ndarray] = None
    style_mel: tp.Optional[np.ndarray] = None   # reference mel for the style encoder


@dataclasses.dataclass
class TTSOptions:
    t_out: int = 1024
    cfm_timesteps: tp.Optional[int] = None
    max_tokens: int = 256


class TTSEvaluationInterface:
    def __init__(self, ckpt_path: tp.Union[str, Path],
                 text_parser: tp.Optional[TextParserHook] = None):
        tree, payload = ExperimentSaver.load_checkpoint(ckpt_path)
        self.payload = payload
        info = payload["pipeline_info"]
        self.pipeline = DataPipeline.from_info(info, ignored_handlers=AUDIO_HANDLERS)
        self.alphabet = self.pipeline.alphabet
        self.text_processor = TTSTextProcessor(self.alphabet, parser=text_parser)

        params = ParallelTTSParams.create(payload["model_params"])
        self.model = ParallelTTSModel(params, rngs=nnx.Rngs(0))
        state = nnx.state(self.model, nnx.Not(nnx.RngState))
        nnx.replace_by_pure_dict(state, tree["model"])
        nnx.update(self.model, state)
        self.batch_processor = TTSBatchProcessor()

        spk = info["singletons"].get("SpeakerIDSetter", {})
        self.speaker2id: tp.Dict[str, int] = spk.get("speaker2id", {})
        self.lang2id: tp.Dict[str, int] = spk.get("lang2id", {})

    # -- catalog --------------------------------------------------------------

    def get_languages(self) -> tp.List[str]:
        return sorted(self.lang2id)

    def get_speakers(self) -> tp.List[str]:
        return sorted(self.speaker2id)

    # -- text frontend -----------------------------------------------------------

    def split_sentences(self, text: str) -> tp.List[str]:
        parts = re.split(r"(?<=[.!?;])\s+", text.strip())
        return [p for p in parts if p]

    def prepare_text(self, text: str, lang: str = "EN") -> tp.List[str]:
        return self.text_processor.parser(text, lang)

    # -- batch construction ---------------------------------------------------------

    def create_context(self, lang: str = "EN",
                       speaker: tp.Optional[str] = None) -> TTSContext:
        ctx = TTSContext(lang=lang, speaker_name=speaker)
        ctx.lang_id = self.lang2id.get(lang, 0)
        if speaker is not None:
            ctx.speaker_id = self.speaker2id.get(speaker, 0)
        return ctx

    def prepare_batch(self, sentences: tp.Sequence[str], ctx: TTSContext,
                      opts: TTSOptions):
        import numpy as np

        samples = []
        for sent in sentences:
            ds = TTSDataSample(
                text=sent, lang=ctx.lang,
                speaker_name=ctx.speaker_name,
                speaker_id=ctx.speaker_id, lang_id=ctx.lang_id,
                speaker_emb=ctx.speaker_emb,
            )
            if "<prosody" in sent:
                # SSML path: per-word modifiers expanded to token level
                from speechflow_tpu.data.processors.ssml import (
                    apply_ssml_modifiers,
                    parse_ssml,
                )

                plain, words = parse_ssml(sent)
                phonemes, word_lengths = [], []
                for word, _ in words:
                    toks = self.prepare_text(word, ctx.lang)
                    phonemes.extend(toks)
                    word_lengths.append(len(toks))
                ds.text = plain
                ds.phonemes = phonemes
                ds.word_lengths = np.asarray(word_lengths, np.int32)
                ds.transcription = self.text_processor.encode_phonemes(phonemes)
                # account for BOS/EOS service tokens in the word map
                if len(ds.transcription) == sum(word_lengths) + 2:
                    ds.word_lengths = np.concatenate(
                        [[1], ds.word_lengths, [1]]).astype(np.int32)
                    words = [("<BOS>", {})] + words + [("<EOS>", {})]
                ds.additional["ssml"] = words
                ds = apply_ssml_modifiers(ds)
            else:
                ds.phonemes = self.prepare_text(sent, ctx.lang)
            samples.append(ds)
        batch = self.pipeline["train"].datasample_to_batch(samples)
        inputs, _ = self.batch_processor(batch)
        return inputs

    # -- inference ---------------------------------------------------------------------

    def evaluate(self, inputs, opts: tp.Optional[TTSOptions] = None) -> TTSOutput:
        opts = opts or TTSOptions()
        return self.model.inference(inputs, t_out=opts.t_out)

    def synthesize(self, text: str, lang: str = "EN",
                   speaker: tp.Optional[str] = None,
                   opts: tp.Optional[TTSOptions] = None) -> TTSOutput:
        """text -> (stacked) mel spectrogram output; feed into the vocoder
        interface for a waveform (reference call chain SURVEY §3.3)."""
        opts = opts or TTSOptions()
        ctx = self.create_context(lang, speaker)
        # sentence splitting would cut across <prosody> spans — SSML input is
        # synthesized as one utterance
        sentences = [text] if "<prosody" in text else self.split_sentences(text)
        inputs = self.prepare_batch(sentences, ctx, opts)
        return self.evaluate(inputs, opts)

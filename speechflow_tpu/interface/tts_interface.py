"""TTS inference SDK: rebuild everything from a checkpoint and synthesize.

Capability parity with the reference TTSEvaluationInterface
(tts/acoustic_models/interface/eval_interface.py:127-775): loads a checkpoint,
restores model params/weights and the *entire data pipeline* from the embedded
payload (pipeline_info with config/alphabet/singleton state), performs
eval-time pipeline surgery (text-only pipe — audio handlers dropped), and
exposes the full API: get_languages / get_speakers(hours filter) /
prepare_text / predict_pauses / predict_prosody_by_text / prepare_embeddings
(reference-audio biometric pipe + mean-embedding catalog) / split_sentences /
prepare_batch / evaluate / synthesize / resynthesize. ``TTSContext`` carries a
``ProsodyReference`` (speaker/style references, reference
interface/prosody_reference.py); ``TTSOptions`` the sampling knobs —
``cfm_timesteps`` is honored by plumbing it into the CFM Euler loop.
"""

from __future__ import annotations

import dataclasses
import logging
import re
import typing as tp
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from flax import nnx

from speechflow_tpu.data.core.components import DataPipeline
from speechflow_tpu.data.core.datasample import TTSDataSample
from speechflow_tpu.data.processors.text import SIL, TextParserHook, TTSTextProcessor
from speechflow_tpu.io import AudioChunk
from speechflow_tpu.models.tts import (
    ParallelTTSModel,
    ParallelTTSParams,
    TTSBatchProcessor,
)
from speechflow_tpu.models.tts.data_types import TTSOutput
from speechflow_tpu.training import ExperimentSaver

__all__ = ["TTSEvaluationInterface", "TTSContext", "TTSOptions", "ProsodyReference"]

AUDIO_HANDLERS = {
    "load_audio", "volume_normalize", "multiple_audio", "magnitude",
    "linear_to_mel", "amp_to_db", "normalize_mel", "energy", "pitch",
    "calc_durations", "aggregate_pitch", "aggregate_energy", "gate_target",
    "add_pauses_from_timestamps",
    # ling/lm features are computed inline at inference (no timestamps exist)
    "add_ling_feat", "add_lm_feat",
}


@dataclasses.dataclass
class ProsodyReference:
    """Reference-audio / speaker management for style transfer
    (reference: interface/prosody_reference.py ComplexProsodyReference —
    one reference set per conditioning role; here a single default role with
    explicit override hooks, which is what the reference's default path uses).
    """

    speaker_name: tp.Optional[str] = None
    speaker_id: int = 0
    speaker_emb: tp.Optional[np.ndarray] = None       # from reference audio
    speaker_emb_mean: tp.Optional[np.ndarray] = None  # catalog mean embedding
    style_mel: tp.Optional[np.ndarray] = None         # reference mel for StyleEncoder

    def initialize(self, speaker2id: tp.Dict[str, int],
                   mean_embs: tp.Dict[str, np.ndarray]) -> "ProsodyReference":
        if self.speaker_name is not None:
            self.speaker_id = speaker2id.get(self.speaker_name, self.speaker_id)
            if self.speaker_emb_mean is None and self.speaker_name in mean_embs:
                self.speaker_emb_mean = np.asarray(mean_embs[self.speaker_name], np.float32)
        if self.speaker_emb is None:
            self.speaker_emb = self.speaker_emb_mean
        return self


@dataclasses.dataclass
class TTSContext:
    lang: str = "EN"
    speaker_name: tp.Optional[str] = None
    speaker_id: int = 0
    lang_id: int = 0
    prosody_reference: ProsodyReference = dataclasses.field(default_factory=ProsodyReference)
    prosody_classes: tp.Optional[tp.Dict[str, np.ndarray]] = None  # per-sentence word classes
    seed: int = 0

    # convenience views
    @property
    def speaker_emb(self) -> tp.Optional[np.ndarray]:
        return self.prosody_reference.speaker_emb

    @property
    def style_mel(self) -> tp.Optional[np.ndarray]:
        return self.prosody_reference.style_mel


@dataclasses.dataclass
class TTSOptions:
    t_out: int = 1024
    cfm_timesteps: tp.Optional[int] = None
    max_tokens: int = 256
    begin_pause: bool = True        # SIL at utterance start
    end_pause: bool = True          # SIL at utterance end
    pause_level: str = "punctuation"  # punctuation | words | none
    use_prosody_model: bool = True


class TTSEvaluationInterface:
    def __init__(self, ckpt_path: tp.Union[str, Path],
                 text_parser: tp.Optional[TextParserHook] = None,
                 prosody_ckpt: tp.Optional[tp.Union[str, Path]] = None,
                 g2p_ckpt: tp.Optional[tp.Union[str, Path]] = None):
        tree, payload = ExperimentSaver.load_checkpoint(ckpt_path)
        self.payload = payload
        info = payload["pipeline_info"]
        self.pipeline = DataPipeline.from_info(info, ignored_handlers=AUDIO_HANDLERS)
        #: full pipeline (audio handlers intact) for resynthesize/biometrics
        self._audio_pipeline: tp.Optional[DataPipeline] = None
        self._info = info
        self.alphabet = self.pipeline.alphabet
        if text_parser is None:
            text_parser = self._discover_g2p(Path(ckpt_path), g2p_ckpt)
        self.text_processor = TTSTextProcessor(self.alphabet, parser=text_parser)

        params = ParallelTTSParams.create(payload["model_params"])
        self.params = params
        self.model = ParallelTTSModel(params, rngs=nnx.Rngs(0))
        state = nnx.state(self.model, nnx.Not(nnx.RngState))
        nnx.replace_by_pure_dict(state, tree["model"])
        nnx.update(self.model, state)
        self.batch_processor = TTSBatchProcessor()

        singles = info.get("singletons", {})
        spk = singles.get("SpeakerIDSetter", {})
        self.speaker2id: tp.Dict[str, int] = spk.get("speaker2id", {})
        self.lang2id: tp.Dict[str, int] = spk.get("lang2id", {})
        self.mean_bio_embs: tp.Dict[str, np.ndarray] = {
            k: np.asarray(v, np.float32)
            for k, v in singles.get("MeanBioEmbeddings", {}).get("mean_emb", {}).items()
        }
        self.speaker_durations: tp.Dict[str, float] = singles.get(
            "DatasetStatistics", {}).get("speaker_durations", {})

        self.prosody_interface = None
        if prosody_ckpt is not None:
            from speechflow_tpu.models.prosody.interface import ProsodyPredictionInterface

            self.prosody_interface = ProsodyPredictionInterface(prosody_ckpt)

    @staticmethod
    def _discover_g2p(ckpt_path: Path,
                      g2p_ckpt: tp.Optional[tp.Union[str, Path]]
                      ) -> tp.Optional[TextParserHook]:
        """Trained-G2P raw-text frontend: explicit path wins, else look for
        ``g2p.pkl`` beside the checkpoint / in the experiment dir (the
        train CLIs save it there).  Falls back to the char-level tokenizer
        with a LOUD warning — char tokens are out-of-distribution for a
        phoneme-trained model, so synthesis quality degrades silently
        otherwise."""
        from speechflow_tpu.data.processors.text import G2PParserHook

        candidates = [Path(g2p_ckpt)] if g2p_ckpt else [
            ckpt_path / "g2p.pkl", ckpt_path.parent / "g2p.pkl",
            ckpt_path.parent.parent / "g2p.pkl",
        ]
        for c in candidates:
            if c.is_file():
                return G2PParserHook(c)
        logging.getLogger("speechflow_tpu").warning(
            "no trained G2P found near %s — raw-text synthesis will use the "
            "char-level fallback (train one with scripts/train_g2p.py)",
            ckpt_path)
        return None

    # -- catalog --------------------------------------------------------------

    def get_languages(self) -> tp.List[str]:
        return sorted(self.lang2id)

    def get_speakers(self, hours_per_speaker: tp.Optional[
            tp.Union[float, tp.Tuple[float, float]]] = None) -> tp.List[str]:
        """Optionally filter by available audio hours (reference :433-455)."""
        if hours_per_speaker and self.speaker_durations:
            hours = {k: v / 3600.0 for k, v in self.speaker_durations.items()}
            if isinstance(hours_per_speaker, (int, float)):
                names = [k for k, v in hours.items() if v > hours_per_speaker]
            else:
                lo, hi = hours_per_speaker
                names = [k for k, v in hours.items() if lo < v < hi]
            return sorted(names)
        return sorted(self.speaker2id)

    # -- text frontend -----------------------------------------------------------

    def split_sentences(self, text: str) -> tp.List[str]:
        parts = re.split(r"(?<=[.!?;])\s+", text.strip())
        return [p for p in parts if p]

    def prepare_text(self, text: str, lang: str = "EN") -> tp.List[str]:
        return self.text_processor.parser(text, lang)

    def predict_pauses(self, words: tp.Sequence[str],
                       opts: tp.Optional[TTSOptions] = None) -> tp.List[bool]:
        """Pause plan: True at word i = insert SIL after word i
        (reference predict_pauses, eval_interface.py:457 — the rule path used
        when no pauses model is attached: punctuation-driven, plus
        begin/end pauses handled by prepare_batch)."""
        opts = opts or TTSOptions()
        out = []
        for w in words:
            if opts.pause_level == "words":
                out.append(True)
            elif opts.pause_level == "punctuation":
                out.append(bool(w) and not w[-1].isalnum())
            else:
                out.append(False)
        if out:
            out[-1] = False  # end pause handled separately
        return out

    def predict_prosody_by_text(self, words: tp.Sequence[str], ctx: TTSContext,
                                opts: tp.Optional[TTSOptions] = None) -> np.ndarray:
        """Per-word prosody contour classes from the prosody model
        (reference :501 -> ProsodyPredictionInterface); -1 (undefined) when no
        model is attached or prediction is disabled."""
        opts = opts or TTSOptions()
        if self.prosody_interface is None or not opts.use_prosody_model:
            return np.full(len(words), -1, np.int32)
        pred = self.prosody_interface.predict(list(words))
        classes = np.where(pred["has_contour"] > 0, pred["category"], -1)
        return classes.astype(np.int32)

    # -- embeddings / references ------------------------------------------------

    def _audio_pipe(self) -> DataPipeline:
        # full train pipe: segas carry word tiers + timestamps, so the ling
        # handlers run for real here (unlike the text-only synthesis pipe)
        if self._audio_pipeline is None:
            self._audio_pipeline = DataPipeline.from_info(self._info)
        return self._audio_pipeline

    def prepare_embeddings(self, ctx: TTSContext,
                           ref_audio: tp.Optional[tp.Union[str, Path, AudioChunk]] = None,
                           ) -> TTSContext:
        """Fill the prosody reference: reference audio runs through the
        biometric/audio pipe (speaker embedding + style mel); otherwise the
        catalog mean embedding for the context speaker is used
        (reference prepare_embeddings, eval_interface.py:516-580)."""
        ref = ctx.prosody_reference
        ref.speaker_name = ref.speaker_name or ctx.speaker_name
        if ref_audio is not None:
            chunk = (ref_audio if isinstance(ref_audio, AudioChunk)
                     else AudioChunk(file_path=ref_audio))
            from speechflow_tpu.data.processors import np_dsp
            from speechflow_tpu.data.processors.embeddings import voice_biometrics

            ds = TTSDataSample(audio_chunk=chunk)
            sr = self._info["config"].get("preproc", {}).get(
                "pipe_cfg", {}).get("load_audio", {}).get("sample_rate", 24000)
            ds.audio_chunk.load(sr=sr)
            ds = voice_biometrics(ds)
            ref.speaker_emb = ds.speaker_emb
            n_mels = self._info["config"].get("preproc", {}).get(
                "pipe_cfg", {}).get("linear_to_mel", {}).get("n_mels", 80)
            if isinstance(n_mels, dict):
                n_mels = next(iter(n_mels.values()))
            mag = np_dsp.magnitude_np(ds.audio_chunk.waveform)
            ref.style_mel = np_dsp.normalize_mel_np(np_dsp.amp_to_db_np(
                np_dsp.linear_to_mel_np(mag, sr, int(n_mels))))
        ref.initialize(self.speaker2id, self.mean_bio_embs)
        return ctx

    # -- batch construction ---------------------------------------------------------

    def create_context(self, lang: str = "EN",
                       speaker: tp.Optional[str] = None) -> TTSContext:
        ctx = TTSContext(lang=lang, speaker_name=speaker)
        ctx.lang_id = self.lang2id.get(lang, 0)
        if speaker is not None:
            ctx.speaker_id = self.speaker2id.get(speaker, 0)
            ctx.prosody_reference.speaker_name = speaker
            ctx.prosody_reference.speaker_id = ctx.speaker_id
        return ctx

    def _build_plain_sample(self, sent: str, ctx: TTSContext,
                            opts: TTSOptions) -> TTSDataSample:
        """Word-by-word G2P + pause plan + ling/lm/prosody features."""
        from speechflow_tpu.data.processors.ling import (
            lm_feat_for_words,
            word_ling_features,
        )
        from speechflow_tpu.data.processors.ling import _expand as ling_expand

        words = sent.split()
        pauses_after = self.predict_pauses(words, opts)
        prosody_classes = self.predict_prosody_by_text(words, ctx, opts)

        phonemes: tp.List[str] = []
        word_map: tp.List[int] = []       # word index per phoneme (-1 = SIL)
        word_lengths: tp.List[int] = []
        if opts.begin_pause:
            phonemes.append(SIL)
            word_map.append(-1)
            word_lengths.append(1)
        for i, w in enumerate(words):
            toks = [t for t in self.prepare_text(w, ctx.lang) if t != SIL]
            if not toks:
                continue
            phonemes.extend(toks)
            word_map.extend([i] * len(toks))
            word_lengths.append(len(toks))
            if pauses_after[i] or (opts.end_pause and i == len(words) - 1):
                phonemes.append(SIL)
                word_map.append(-1)
                word_lengths.append(1)

        ds = TTSDataSample(
            text=sent, lang=ctx.lang, speaker_name=ctx.speaker_name,
            speaker_id=ctx.speaker_id, lang_id=ctx.lang_id,
            speaker_emb=ctx.speaker_emb, phonemes=phonemes,
        )
        ds.transcription = self.text_processor.encode_phonemes(phonemes)

        intonation = sent.rstrip()[-1:] if sent.rstrip()[-1:] in "?!" else "."
        if self.params.use_ling_feat:
            wf = word_ling_features(words, intonation=intonation)
            mat = ling_expand(wf, np.asarray(word_map), phonemes)
            ds.ling_feat = _service_pad(mat, ds, sil_row=True)
        if self.params.use_lm_feat:
            wf = lm_feat_for_words(words)
            mat = np.zeros((len(phonemes), wf.shape[1]), np.float32)
            for i, w in enumerate(word_map):
                if w >= 0:
                    mat[i] = wf[w]
            ds.lm_feat = _service_pad(mat, ds, sil_row=False)
        if self.params.use_prosody:
            pros = np.full(len(phonemes), -1, np.int32)
            for i, w in enumerate(word_map):
                if w >= 0:
                    pros[i] = prosody_classes[w]
            if ds.n_tokens == len(pros) + 2:
                pros = np.concatenate([[-1], pros, [-1]]).astype(np.int32)
            ds.prosody = pros

        wl = list(word_lengths)
        if ds.n_tokens == sum(wl) + 2:
            wl = [1] + wl + [1]
        ds.word_lengths = np.asarray(wl, np.int32)
        return ds

    def prepare_batch(self, sentences: tp.Sequence[str], ctx: TTSContext,
                      opts: TTSOptions):
        samples = []
        for sent in sentences:
            if "<prosody" in sent:
                samples.append(self._build_ssml_sample(sent, ctx))
            else:
                samples.append(self._build_plain_sample(sent, ctx, opts))
        batch = self.pipeline["train"].datasample_to_batch(samples)
        inputs, _ = self.batch_processor(batch)
        if ctx.style_mel is not None and inputs.mel is None:
            style = jnp.asarray(ctx.style_mel)[None]
            inputs = dataclasses.replace(
                inputs, mel=jnp.broadcast_to(
                    style, (len(samples),) + style.shape[1:]),
                mel_lengths=jnp.full((len(samples),), style.shape[1], jnp.int32))
        return inputs

    def _build_ssml_sample(self, sent: str, ctx: TTSContext) -> TTSDataSample:
        from speechflow_tpu.data.processors.ssml import (
            apply_ssml_modifiers,
            parse_ssml,
        )

        ds = TTSDataSample(
            text=sent, lang=ctx.lang, speaker_name=ctx.speaker_name,
            speaker_id=ctx.speaker_id, lang_id=ctx.lang_id,
            speaker_emb=ctx.speaker_emb,
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
        if len(ds.transcription) == sum(word_lengths) + 2:
            ds.word_lengths = np.concatenate([[1], ds.word_lengths, [1]]).astype(np.int32)
            words = [("<BOS>", {})] + words + [("<EOS>", {})]
        ds.additional["ssml"] = words
        return apply_ssml_modifiers(ds)

    # -- inference ---------------------------------------------------------------------

    def evaluate(self, inputs, opts: tp.Optional[TTSOptions] = None) -> TTSOutput:
        opts = opts or TTSOptions()
        return self.model.inference(inputs, t_out=opts.t_out,
                                    cfm_timesteps=opts.cfm_timesteps)

    def synthesize(self, text: str, lang: str = "EN",
                   speaker: tp.Optional[str] = None,
                   ref_audio: tp.Optional[tp.Union[str, Path, AudioChunk]] = None,
                   opts: tp.Optional[TTSOptions] = None) -> TTSOutput:
        """text -> (stacked) mel spectrogram output; feed into the vocoder
        interface for a waveform (reference call chain SURVEY §3.3):
        prepare_text -> predict_pauses -> predict_prosody -> prepare_embeddings
        -> prepare_batch -> evaluate."""
        opts = opts or TTSOptions()
        ctx = self.create_context(lang, speaker)
        ctx = self.prepare_embeddings(ctx, ref_audio)
        # sentence splitting would cut across <prosody> spans — SSML input is
        # synthesized as one utterance
        sentences = [text] if "<prosody" in text else self.split_sentences(text)
        inputs = self.prepare_batch(sentences, ctx, opts)
        return self.evaluate(inputs, opts)

    def resynthesize(self, sega_path: tp.Union[str, Path],
                     ref_audio: tp.Optional[tp.Union[str, Path, AudioChunk]] = None,
                     opts: tp.Optional[TTSOptions] = None) -> TTSOutput:
        """Annotated utterance -> full feature pipeline -> model inference;
        with ``ref_audio`` the speaker/style references are swapped for the
        reference speaker's (voice-conversion-style copy synthesis, reference
        eval_interface.py:722-775)."""
        opts = opts or TTSOptions()
        pipe = self._audio_pipe()
        from speechflow_tpu.data.parsers import TTSDSParser

        dataset = TTSDSParser().read_datasamples([str(sega_path)])
        assert len(dataset) == 1, f"could not parse {sega_path}"
        ds = dataset[0]
        ds.speaker_id = self.speaker2id.get(ds.speaker_name, 0)
        ds.lang_id = self.lang2id.get(ds.lang, 0)
        if ref_audio is not None:
            ctx = TTSContext()
            self.prepare_embeddings(ctx, ref_audio)
            ds.speaker_emb = ctx.speaker_emb
        batch = pipe["train"].datasample_to_batch([ds])
        inputs, _ = self.batch_processor(batch)
        t_out = int(inputs.mel.shape[1]) if inputs.mel is not None else opts.t_out
        if ref_audio is not None and inputs.mel is not None:
            # style comes from the reference, not the source utterance
            ctx_mel = jnp.asarray(ctx.style_mel)[None] if ctx.style_mel is not None else inputs.mel
            inputs = dataclasses.replace(inputs, mel=ctx_mel,
                                         mel_lengths=jnp.asarray([ctx_mel.shape[1]], jnp.int32))
        return self.model.inference(inputs, t_out=t_out,
                                    cfm_timesteps=opts.cfm_timesteps)


def _service_pad(mat: np.ndarray, ds: TTSDataSample, sil_row: bool) -> np.ndarray:
    if ds.n_tokens == mat.shape[0] + 2:
        row = np.zeros((1, mat.shape[1]), mat.dtype)
        if sil_row:
            row[0, 0] = 1.0
        mat = np.concatenate([row, mat, row.copy()], axis=0)
    return mat

"""XTTS evaluation interface: checkpoint -> text -> codec tokens -> waveform.

Counterpart of the reference's GPT-acoustic inference path (XTTSDecoder +
gpt_acoustic.py streaming sampling consumed through the eval interfaces):
rebuilds the text pipeline from the checkpoint payload, tokenizes raw text
with the training alphabet, samples codec tokens with the KV-cached GPT and
decodes them to audio with the co-trained neural codec.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import jax
import numpy as np
from flax import nnx

from speechflow_tpu.data.core.components import DataPipeline
from speechflow_tpu.data.processors.text import TTSTextProcessor
from speechflow_tpu.io import AudioChunk
from speechflow_tpu.models.tts import XTTSModel, XTTSParams
from speechflow_tpu.training import ExperimentSaver

__all__ = ["XTTSEvaluationInterface"]


class XTTSEvaluationInterface:
    def __init__(self, ckpt_path: tp.Union[str, Path]):
        import jax.numpy as jnp  # noqa: F401

        tree, payload = ExperimentSaver.load_checkpoint(ckpt_path)
        self.payload = payload
        info = payload["pipeline_info"]
        self.pipeline = DataPipeline.from_info(info, ignored_handlers=set())
        self.alphabet = self.pipeline.alphabet
        self.text_processor = TTSTextProcessor(self.alphabet)

        params = XTTSParams.create(payload["model_params"])
        self.params = params
        self.model = XTTSModel(params, rngs=nnx.Rngs(0))
        state = nnx.state(self.model, nnx.Not(nnx.RngState))
        nnx.replace_by_pure_dict(state, tree["model"])
        nnx.update(self.model, state)

        singles = info.get("singletons", {})
        spk = singles.get("SpeakerIDSetter", {})
        self.speaker2id: tp.Dict[str, int] = spk.get("speaker2id", {})
        self.sample_rate = int(self.params.codec.get("sample_rate", 24000))

    def get_speakers(self) -> tp.List[str]:
        return sorted(self.speaker2id)

    def prepare_text(self, text: str, lang: str = "EN") -> np.ndarray:
        return self.text_processor.encode_text(text, lang)

    def prompt_mel_from_audio(self, ref_audio: tp.Union[str, Path, AudioChunk]
                              ) -> np.ndarray:
        """Reference audio -> normalized mel matching the training pipeline's
        mel handler (the prompt the WithPrompt collate fed at train time)."""
        from speechflow_tpu.data.processors import np_dsp

        chunk = (ref_audio if isinstance(ref_audio, AudioChunk)
                 else AudioChunk(file_path=ref_audio))
        pipe_cfg = (self.payload["pipeline_info"].get("config", {})
                    .get("preproc", {}).get("pipe_cfg", {}))
        sr = pipe_cfg.get("load_audio", {}).get("sample_rate", self.sample_rate)
        n_mels = pipe_cfg.get("linear_to_mel", {}).get("n_mels", 80)
        if isinstance(n_mels, dict):
            n_mels = next(iter(n_mels.values()))
        if chunk.waveform is None:
            chunk.load(sr=sr)
        mag = np_dsp.magnitude_np(chunk.waveform)
        return np_dsp.normalize_mel_np(np_dsp.amp_to_db_np(
            np_dsp.linear_to_mel_np(mag, sr, int(n_mels)))).astype(np.float32)

    def synthesize(self, text: str, speaker: tp.Optional[str] = None,
                   max_tokens: int = 512, temperature: float = 0.8,
                   seed: int = 0,
                   ref_audio: tp.Optional[tp.Union[str, Path, AudioChunk]] = None,
                   ) -> AudioChunk:
        """``ref_audio``: reference utterance for zero-shot voice cloning —
        its mel is prefixed to the GPT context (reference
        xtts_decoder.py:94-104 prompt conditioning)."""
        import jax.numpy as jnp

        ids = self.prepare_text(text)
        pad = (-len(ids)) % 16
        ids = np.pad(ids, (0, pad))
        sid = None
        if speaker is not None:
            sid = jnp.asarray([self.speaker2id.get(speaker, 0)], jnp.int32)
        prompt_mel = prompt_lens = None
        if ref_audio is not None and self.params.use_prompt:
            mel = self.prompt_mel_from_audio(ref_audio)
            prompt_mel = jnp.asarray(mel[None])
            prompt_lens = jnp.asarray([mel.shape[0]], jnp.int32)
        wav = self.model.synthesize(
            jnp.asarray(ids[None]), speaker_id=sid, max_tokens=max_tokens,
            temperature=temperature, key=jax.random.PRNGKey(seed),
            prompt_mel=prompt_mel, prompt_mel_lengths=prompt_lens)
        return AudioChunk(data=np.asarray(wav)[0], sr=self.sample_rate)

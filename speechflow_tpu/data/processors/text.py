"""Text frontend: alphabet, phoneme tokenization, service tokens.

Capability parity with the reference TTSTextProcessor
(speechflow/data_pipeline/datasample_processors/tts_text_processors.py:57),
re-founded without the external multilingual_text_parser (.NET/eSpeak)
dependency: during *training*, phoneme sequences come from the TextGrid
``phonemes`` tier (the reference stores the parser's output there), so the
frontend only needs a stable phoneme<->id alphabet; for *inference* a
pluggable grapheme/G2P hook converts raw text (built-in: char-level fallback;
an external phonemizer can be injected behind ``TextParserHook``).
"""

from __future__ import annotations

import typing as tp

import numpy as np

from speechflow_tpu.data.core.datasample import TTSDataSample
from speechflow_tpu.data.processors import handler

__all__ = ["Alphabet", "TTSTextProcessor", "TextParserHook", "G2PParserHook",
           "ARPABET_TO_IPA", "to_ipa", "phonemes_to_ipa"]

PAD, BOS, EOS, SIL, UNK = "<PAD>", "<BOS>", "<EOS>", "<SIL>", "<UNK>"
SERVICE_TOKENS = (PAD, BOS, EOS, SIL, UNK)


class Alphabet:
    """Stable token<->id mapping with service tokens at fixed low ids."""

    def __init__(self, symbols: tp.Sequence[str]):
        self.symbols: tp.List[str] = list(SERVICE_TOKENS) + [
            s for s in sorted(set(symbols)) if s not in SERVICE_TOKENS
        ]
        self.index: tp.Dict[str, int] = {s: i for i, s in enumerate(self.symbols)}

    def __len__(self) -> int:
        return len(self.symbols)

    def __contains__(self, s: str) -> bool:
        return s in self.index

    def encode(self, tokens: tp.Sequence[str]) -> np.ndarray:
        unk = self.index[UNK]
        return np.asarray([self.index.get(t, unk) for t in tokens], dtype=np.int32)

    def decode(self, ids: tp.Sequence[int]) -> tp.List[str]:
        return [self.symbols[i] for i in ids]

    def to_dict(self) -> dict:
        return {"symbols": self.symbols}

    @staticmethod
    def from_dict(d: dict) -> "Alphabet":
        a = Alphabet([])
        a.symbols = list(d["symbols"])
        a.index = {s: i for i, s in enumerate(a.symbols)}
        return a

    @property
    def pad_id(self) -> int:
        return self.index[PAD]

    @property
    def sil_id(self) -> int:
        return self.index[SIL]

    @property
    def bos_id(self) -> int:
        return self.index[BOS]

    @property
    def eos_id(self) -> int:
        return self.index[EOS]


class TextParserHook:
    """Pluggable raw-text -> phoneme-sequence hook (inference path).

    The built-in fallback is a character tokenizer (lowercased, punctuation as
    pause markers); inject an external phonemizer by subclassing.  Every hook
    first expands digits/abbreviations through ``text_norm.normalize_text``
    (the reference normalizes inside multilingual_text_parser before
    phonemization, tts_text_processors.py:57).
    """

    PAUSE_CHARS = ".,;:!?—–-"

    @staticmethod
    def normalize(text: str, lang: str = "EN") -> str:
        from speechflow_tpu.data.processors.text_norm import normalize_text

        return normalize_text(text, lang)

    def __call__(self, text: str, lang: str = "EN") -> tp.List[str]:
        out: tp.List[str] = []
        for ch in self.normalize(text, lang).strip().lower():
            if ch.isspace():
                continue
            if ch in self.PAUSE_CHARS:
                out.append(SIL)
            else:
                out.append(ch)
        return out


class G2PParserHook(TextParserHook):
    """Raw text -> phonemes through a framework-trained G2P model
    (models/g2p: corpus-mined lexicon + seq2seq for OOV words).

    This is the default inference path when a ``g2p.pkl`` checkpoint is
    available — it produces the same phoneme symbol space the model trained
    on, unlike the char-level fallback.  Capability parity with the external
    multilingual_text_parser (tts_text_processors.py:57)."""

    _WORD_OR_PAUSE = None  # compiled lazily (re import cost)

    def __init__(self, g2p: tp.Union[str, "tp.Any"]):
        from speechflow_tpu.models.g2p import G2P

        self.g2p = G2P.load(g2p) if isinstance(g2p, (str, bytes)) or hasattr(
            g2p, "__fspath__") else g2p

    def __call__(self, text: str, lang: str = "EN") -> tp.List[str]:
        import re

        if G2PParserHook._WORD_OR_PAUSE is None:
            G2PParserHook._WORD_OR_PAUSE = re.compile(
                r"[\w']+|[" + re.escape(self.PAUSE_CHARS) + r"]+")
        pieces = G2PParserHook._WORD_OR_PAUSE.findall(
            self.normalize(text, lang).strip().lower())
        words = [p for p in pieces if p[0] not in self.PAUSE_CHARS]
        prons = dict(zip(words, self.g2p.predict(words, lang)))
        out: tp.List[str] = []
        for p in pieces:
            if p[0] in self.PAUSE_CHARS:
                if not out or out[-1] != SIL:
                    out.append(SIL)
            else:
                out.extend(prons.get(p, ()))
        return out


def phonemize_words(text: str, hook: tp.Optional[TextParserHook] = None,
                    lang: str = "EN") -> tp.Tuple[tp.List[str], tp.List[int]]:
    """Phonemize raw text word-by-word -> (phonemes, per-word counts).

    Used by the ``phonemize`` handler and by PhonemeStatistics when a corpus
    carries text but no phoneme tier (the annotator's stage-1 forced-alignment
    input: seg-generator ``.TextGrid`` files have only word timestamps —
    reference data_stage1.yml phonemizes via TTSTextProcessor,
    tts_text_processors.py:57). Punctuation is stripped here; pause insertion
    is ``add_pauses_from_text``'s job so stage 1 controls it by config.
    """
    hook = hook or TextParserHook()
    phonemes: tp.List[str] = []
    counts: tp.List[int] = []
    for word in text.split():
        core = word.strip(hook.PAUSE_CHARS + "\"'()[]")
        if not core:
            continue
        phs = [p for p in hook(core, lang) if p != SIL]
        if not phs:
            continue
        phonemes.extend(phs)
        counts.append(len(phs))
    return phonemes, counts


@handler(inputs={"text"}, outputs={"phonemes", "word_lengths"})
def phonemize(ds: TTSDataSample, g2p: tp.Optional[str] = None) -> TTSDataSample:
    """Text -> phonemes for samples without a phoneme tier (stage-1 FA
    training data). No-op when phonemes already exist (TextGrid-parsed
    corpora). ``g2p`` optionally points at a trained g2p.pkl; the default is
    the char-level TextParserHook, matching PhonemeStatistics' alphabet."""
    if ds.phonemes or not ds.text:
        return ds
    hook = G2PParserHook(g2p) if g2p else TextParserHook()
    phs, counts = phonemize_words(ds.text, hook, ds.lang or "EN")
    ds.phonemes = phs
    ds.word_lengths = np.asarray(counts, dtype=np.int32)
    ds.phoneme_timestamps = None
    return ds


class TTSTextProcessor:
    """Stateful text frontend bound to an Alphabet."""

    def __init__(self, alphabet: tp.Optional[Alphabet] = None,
                 parser: tp.Optional[TextParserHook] = None,
                 add_service_tokens: bool = True):
        self.alphabet = alphabet
        self.parser = parser or TextParserHook()
        self.add_service_tokens = add_service_tokens

    def encode_phonemes(self, phonemes: tp.Sequence[str]) -> np.ndarray:
        toks = ["" if p is None else p for p in phonemes]
        toks = [SIL if t in ("", "undefined_sil") else t for t in toks]
        if self.add_service_tokens:
            toks = [BOS] + toks + [EOS]
        return self.alphabet.encode(toks)

    def encode_text(self, text: str, lang: str = "EN") -> np.ndarray:
        return self.encode_phonemes(self.parser(text, lang))

    def __call__(self, ds: TTSDataSample) -> TTSDataSample:
        return self.process(ds)

    def process(self, ds: TTSDataSample) -> TTSDataSample:
        if ds.phonemes is not None:
            ds.transcription = self.encode_phonemes(ds.phonemes)
        elif ds.text is not None:
            ds.transcription = self.encode_text(ds.text, ds.lang or "EN")
        ds.transform_params.setdefault("text", {}).update(
            alphabet_size=len(self.alphabet), add_service_tokens=self.add_service_tokens
        )
        return ds


@handler(inputs={"phonemes"}, outputs={"transcription"})
def text_to_transcription(ds: TTSDataSample, processor: tp.Optional[TTSTextProcessor] = None) -> TTSDataSample:
    """Pipe-level wrapper; ``processor`` is bound by PipelineComponents."""
    assert processor is not None, "text processor must be injected by the pipeline"
    return processor.process(ds)


# ---------------------------------------------------------------- IPA mapping

#: ARPABET -> IPA (reference: the multilingual parser's is_ipa_phonemes mode,
#: tts_text_processors.py:78-132 — multilingual recipes share one IPA symbol
#: space so phonemes transfer across languages). Stress digits map to the
#: IPA stress diacritics the reference's "truncated" mode prefixes.
ARPABET_TO_IPA: tp.Dict[str, str] = {
    "AA": "ɑ", "AE": "æ", "AH": "ʌ", "AO": "ɔ", "AW": "aʊ", "AY": "aɪ",
    "EH": "ɛ", "ER": "ɝ", "EY": "eɪ", "IH": "ɪ", "IY": "i", "OW": "oʊ",
    "OY": "ɔɪ", "UH": "ʊ", "UW": "u",
    "B": "b", "CH": "tʃ", "D": "d", "DH": "ð", "F": "f", "G": "ɡ",
    "HH": "h", "JH": "dʒ", "K": "k", "L": "l", "M": "m", "N": "n",
    "NG": "ŋ", "P": "p", "R": "ɹ", "S": "s", "SH": "ʃ", "T": "t",
    "TH": "θ", "V": "v", "W": "w", "Y": "j", "Z": "z", "ZH": "ʒ",
}
_STRESS_MARKS = {"1": "ˈ", "2": "ˌ", "0": ""}


def to_ipa(phoneme: str) -> str:
    """One ARPABET phoneme (optionally stress-suffixed, e.g. "AA1") -> IPA.

    Service tokens and unknown symbols pass through unchanged so mixed
    alphabets (SIL/BOS/EOS + phones) stay valid."""
    if phoneme in SERVICE_TOKENS:
        return phoneme
    base, stress = phoneme, ""
    if base and base[-1] in _STRESS_MARKS:
        stress = _STRESS_MARKS[base[-1]]
        base = base[:-1]
    ipa = ARPABET_TO_IPA.get(base.upper())
    return phoneme if ipa is None else stress + ipa


def phonemes_to_ipa(phonemes: tp.Sequence[str]) -> tp.List[str]:
    return [to_ipa(p) for p in phonemes]

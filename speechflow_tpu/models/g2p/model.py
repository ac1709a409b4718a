"""Trainable grapheme-to-phoneme model (corpus-mined, alignment + tagger).

The reference phonemizes raw text through the external multilingual_text_parser
(.NET/eSpeak, tts_text_processors.py:57).  That binary is unavailable offline,
so the framework trains its own G2P on the very corpus it trains TTS on: every
`.TextGridStage3` file carries aligned ``words`` and ``phonemes`` tiers, so the
(grapheme-sequence -> phoneme-sequence) lexicon falls out of the training data
for free — the same zero-egress pattern as the CPC features and the skip-gram
WordLM.

Model choice: at corpus-lexicon scale (hundreds to a few thousand word types) a
full seq2seq transducer badly underfits — measured on the mini corpus it
reached PER 0.86 held-out after 100 s of training, while the Sequitur-family
recipe below reaches PER ~0.25.  The recipe:

1. **Grapheme↔phoneme alignment** (EM): each grapheme emits 0..2 phonemes; a
   DP per word maximises co-occurrence log-scores, re-estimated over a few
   iterations.  This converts every word into per-grapheme phoneme *chunks*.
2. **Per-grapheme chunk tagger**: the default is a full-word bidirectional
   GRU (whole-word context — what EN stress placement and RU stress-dependent
   vowel reduction need); a 7-char window MLP is kept as the ``arch="mlp"``
   alternative.  The entire AdamW optimization runs as ONE ``lax.scan``
   program (~12x fewer host dispatches than a python step loop).
3. **Decode** is a single batched forward over all (padded) query words
   followed by chunk concatenation — no autoregression, trivially jit/TPU
   friendly and O(1) latency in word length.

At inference the mined lexicon is consulted first (the reference parser is
likewise lexicon-first); the classifier only handles OOV words.
"""

from __future__ import annotations

import pickle
import re
import typing as tp
from collections import defaultdict
from pathlib import Path

import numpy as np

__all__ = ["G2P", "train_g2p", "mine_g2p_lexicon", "align_lexicon",
           "normalize_word", "phoneme_error_rate"]

_WORD_CLEAN_RE = re.compile(r"[^\w']+", re.UNICODE)

MAX_WORD = 24     # longest word the miner accepts
MAX_PHON = 28     # longest pronunciation the miner accepts
BOW, EOW, UNK_CHAR = "<", ">", "\0"   # window boundary / unknown-char markers

Lexicon = tp.List[tp.Tuple[str, str, tp.Tuple[str, ...]]]


def normalize_word(word: str) -> str:
    return _WORD_CLEAN_RE.sub("", word.lower())


def phoneme_error_rate(pred: tp.Sequence[str], ref: tp.Sequence[str]) -> float:
    """Levenshtein distance / reference length — the standard G2P metric."""
    m, n = len(pred), len(ref)
    D = np.zeros((m + 1, n + 1), np.int32)
    D[:, 0] = np.arange(m + 1)
    D[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1,
                          D[i - 1, j - 1] + (pred[i - 1] != ref[j - 1]))
    return float(D[m, n]) / max(n, 1)


def mine_g2p_lexicon(
    seg_paths: tp.Iterable[tp.Union[str, Path]],
) -> Lexicon:
    """Extract a (lang, word, phoneme-seq) lexicon from TextGrid segs.

    Phoneme intervals are matched to the word interval containing them
    (reference stores the parser's per-word phonemization in exactly these
    tiers, seg_io.py:62)."""
    from speechflow_tpu.io.seg import AudioSeg

    lex: tp.Set[tp.Tuple[str, str, tp.Tuple[str, ...]]] = set()
    for p in seg_paths:
        p = Path(p)
        try:
            seg = AudioSeg.load(p)
        except Exception:
            continue
        lang = seg.lang or ("RU" if "RU" in str(p) else "EN")
        phones = list(seg.phonemes())
        for ws, we, wtext in seg.words():
            w = normalize_word(wtext)
            if not w or len(w) > MAX_WORD:
                continue
            pron = tuple(lbl for (s, e, lbl) in phones
                         if s >= ws - 1e-6 and e <= we + 1e-6 and lbl)
            # service/silence tokens are tier markup, not pronunciations —
            # without this filter the BOS/EOS bound markers mine as fake
            # words ('bos' -> ('BOS',)) and pollute the phoneme inventory
            if any(x in ("BOS", "EOS", "SIL", "UNK") for x in pron):
                continue
            if pron and len(pron) <= MAX_PHON:
                lex.add((lang, w, pron))
    return sorted(lex)


# --------------------------------------------------------------------------- #
#  alignment (EM over emission co-occurrence scores)                          #
# --------------------------------------------------------------------------- #


def align_lexicon(
    lexicon: Lexicon,
    iters: int = 3,
    max_emit: int = 2,
    eps_penalty: float = 2.0,
    multi_penalty: float = 1.0,
) -> tp.List[tp.Optional[tp.List[tp.Tuple[str, ...]]]]:
    """1-to-(0..max_emit) grapheme->phoneme alignment.

    Returns, for each lexicon entry, a list of phoneme chunks — one per
    grapheme (``None`` if the entry cannot be aligned within the emission
    budget, e.g. pronunciations more than ``max_emit``× longer than the word).
    Co-occurrence scores start IBM-model-1 style (uniform within word) and are
    re-estimated from the Viterbi alignments for ``iters`` rounds."""
    NEG = -1e9
    score: tp.Dict[str, tp.Dict[str, float]] = defaultdict(lambda: defaultdict(float))
    for _, w, pron in lexicon:
        for g in w:
            for p in pron:
                score[g][p] += 1.0 / (len(w) * len(pron))

    aligns: tp.List[tp.Optional[tp.List[tp.Tuple[str, ...]]]] = []
    for _ in range(iters):
        counts: tp.Dict[str, tp.Dict[str, float]] = defaultdict(lambda: defaultdict(float))
        aligns = []
        for _, w, pron in lexicon:
            G, P = len(w), len(pron)
            D = np.full((G + 1, P + 1), NEG)
            D[0, 0] = 0.0
            bk: tp.Dict[tp.Tuple[int, int], int] = {}

            def s(g: str, p: str) -> float:
                return float(np.log(score[g][p] + 1e-4))

            for i in range(1, G + 1):
                g = w[i - 1]
                for j in range(P + 1):
                    best, arg = NEG, 0
                    if D[i - 1, j] > NEG / 2:                      # emit nothing
                        v = D[i - 1, j] - eps_penalty
                        if v > best:
                            best, arg = v, 0
                    for k in range(1, min(max_emit, j) + 1):       # emit k phonemes
                        if D[i - 1, j - k] > NEG / 2:
                            v = (D[i - 1, j - k] - multi_penalty * (k - 1)
                                 + sum(s(g, pron[j - m - 1]) for m in range(k)))
                            if v > best:
                                best, arg = v, k
                    D[i, j], bk[(i, j)] = best, arg
            if D[G, P] <= NEG / 2:
                aligns.append(None)
                continue
            i, j, chunks = G, P, []
            while i > 0:
                k = bk[(i, j)]
                chunks.append(tuple(pron[j - k: j]))
                i, j = i - 1, j - k
            chunks.reverse()
            aligns.append(chunks)
            for g, ch in zip(w, chunks):
                for p in ch:
                    counts[g][p] += 1.0
        score = counts
    return aligns


# --------------------------------------------------------------------------- #
#  model                                                                      #
# --------------------------------------------------------------------------- #


def _mlp_forward(params: dict, x, win: int, dropout: float = 0.0, key=None):
    """x: (N, win+1) int32 — win char ids + a lang id.  Returns (N, n_chunks)."""
    import jax
    import jax.numpy as jnp

    ce = params["ce"][x[:, :win]].reshape(x.shape[0], -1)
    le = params["le"][x[:, win]]
    h = jnp.concatenate([ce, le], -1)
    if key is not None and dropout > 0:
        h = h * jax.random.bernoulli(key, 1 - dropout, h.shape) / (1 - dropout)
    h = jax.nn.gelu(h @ params["w1"] + params["b1"])
    if key is not None and dropout > 0:
        h = (h * jax.random.bernoulli(jax.random.fold_in(key, 1),
                                      1 - dropout, h.shape) / (1 - dropout))
    h = jax.nn.gelu(h @ params["w2"] + params["b2"])
    return h @ params["wo"] + params["bo"]


def _gru_dir(params: dict, prefix: str, e, reverse: bool):
    """One GRU direction over (B, L, D) embeddings -> (B, L, H)."""
    import jax
    import jax.numpy as jnp

    Wz, Uz, bz = params[prefix + "Wz"], params[prefix + "Uz"], params[prefix + "bz"]
    Wr, Ur, br = params[prefix + "Wr"], params[prefix + "Ur"], params[prefix + "br"]
    Wn, Un, bn = params[prefix + "Wn"], params[prefix + "Un"], params[prefix + "bn"]

    def cell(h, x_t):
        z = jax.nn.sigmoid(x_t @ Wz + h @ Uz + bz)
        r = jax.nn.sigmoid(x_t @ Wr + h @ Ur + br)
        n = jnp.tanh(x_t @ Wn + (r * h) @ Un + bn)
        h = (1 - z) * n + z * h
        return h, h

    seq = jnp.swapaxes(e, 0, 1)                        # (L, B, D)
    h0 = jnp.zeros((e.shape[0], Uz.shape[0]), e.dtype)
    _, hs = jax.lax.scan(cell, h0, seq, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)                      # (B, L, H)


def _gru_forward(params: dict, x, lang_ids, dropout: float = 0.0, key=None):
    """Full-word bidirectional GRU tagger.

    x: (B, L) char ids, lang_ids: (B,).  Returns (B, L, n_chunks).  Unlike
    the window MLP, every position conditions on the WHOLE word — which is
    what English stress assignment and Russian vowel reduction (both functions
    of global stress position) actually need."""
    import jax
    import jax.numpy as jnp

    e = params["ce"][x] + params["le"][lang_ids][:, None, :]   # (B, L, D)
    if key is not None and dropout > 0:
        e = e * jax.random.bernoulli(key, 1 - dropout, e.shape) / (1 - dropout)
    hf = _gru_dir(params, "f_", e, reverse=False)
    hb = _gru_dir(params, "b_", e, reverse=True)
    h = jnp.concatenate([hf, hb], -1)
    if key is not None and dropout > 0:
        h = (h * jax.random.bernoulli(jax.random.fold_in(key, 1),
                                      1 - dropout, h.shape) / (1 - dropout))
    h = jax.nn.gelu(h @ params["w1"] + params["b1"])
    return h @ params["wo"] + params["bo"]


class G2P:
    """Trained G2P: char/lang vocabularies, chunk inventory, MLP params.

    ``params`` is one parameter tree or a list of them (a seed ensemble whose
    log-softmax outputs are averaged — measured −0.01 PER / +0.03 word
    exact-match on mini-corpus CV).  ``bigrams`` is an optional (S, T) pair
    of chunk-class
    transition log-probability matrices mined from the aligned training
    lexicon; when present, OOV decoding runs a Viterbi pass over
    per-position classifier log-probs + ``bigram_weight`` × transition
    scores instead of independent per-position argmax, restoring the
    phonotactic coherence a position-independent classifier can't express."""

    def __init__(self, cvocab: tp.Dict[str, int], lvocab: tp.Dict[str, int],
                 chunk_symbols: tp.Sequence[tp.Tuple[str, ...]],
                 params: tp.Union[dict, tp.Sequence[dict]], win: int = 7,
                 lexicon: tp.Optional[tp.Dict[tp.Tuple[str, str],
                                              tp.Tuple[str, ...]]] = None,
                 bigrams: tp.Optional[tp.Tuple[np.ndarray, np.ndarray]] = None,
                 bigram_weight: float = 0.0,
                 arch: str = "mlp"):
        self.cvocab = dict(cvocab)
        self.lvocab = dict(lvocab)
        self.chunk_symbols = [tuple(c) for c in chunk_symbols]
        self.params = params
        self.win = win
        self.arch = arch
        self.bigrams = bigrams
        self.bigram_weight = float(bigram_weight)
        #: exact pronunciations mined at train time; consulted before the
        #: neural decode (the reference parser is likewise lexicon-first)
        self.lexicon = dict(lexicon or {})
        self._cache: tp.Dict[tp.Tuple[str, str], tp.Tuple[str, ...]] = {}
        self._fwd_jit = None

    @property
    def _params_list(self) -> tp.List[dict]:
        return list(self.params) if isinstance(self.params, (list, tuple)) \
            else [self.params]

    @property
    def phoneme_inventory(self) -> tp.List[str]:
        return sorted({p for ch in self.chunk_symbols for p in ch})

    # -- encoding ------------------------------------------------------------

    def _features(self, word: str, lang: str) -> np.ndarray:
        """(len(word), win+1) int32 rows of window char ids + lang id."""
        half = self.win // 2
        unk = self.cvocab[UNK_CHAR]
        padded = BOW * half + word + EOW * half
        lid = self.lvocab.get(lang.upper(), 0)
        rows = [[self.cvocab.get(padded[i + k], unk) for k in range(self.win)]
                + [lid] for i in range(len(word))]
        return np.asarray(rows, np.int32)

    # -- decode --------------------------------------------------------------

    def _build_fwd(self):
        import jax
        import jax.numpy as jnp

        params = [jax.tree.map(jnp.asarray, p) for p in self._params_list]
        win = self.win

        if self.arch == "gru":
            @jax.jit
            def fwd(x, lang_ids):
                lp = sum(jax.nn.log_softmax(_gru_forward(p, x, lang_ids), -1)
                         for p in params)
                return lp / len(params)
        else:
            @jax.jit
            def fwd(x):
                # ensemble: average the members' log-softmax (geometric mean
                # of the predictive distributions)
                lp = sum(jax.nn.log_softmax(_mlp_forward(p, x, win), -1)
                         for p in params)
                return lp / len(params)

        return fwd

    def _decode(self, logp: np.ndarray) -> tp.List[int]:
        """Per-word class decode from (T, C) log-probs: Viterbi over the
        mined chunk-class bigram when available, argmax otherwise."""
        if self.bigrams is None or self.bigram_weight <= 0 or len(logp) == 0:
            return [int(c) for c in logp.argmax(-1)]
        logS, logT = self.bigrams
        w = self.bigram_weight
        score = logp[0] + w * logS
        back = []
        for t in range(1, len(logp)):
            m = score[:, None] + w * logT            # (prev, next)
            back.append(m.argmax(0))
            score = m.max(0) + logp[t]
        path = [int(score.argmax())]
        for bk in reversed(back):
            path.append(int(bk[path[-1]]))
        path.reverse()
        return path

    def predict(self, words: tp.Sequence[str], lang: str = "EN",
                use_lexicon: bool = True) -> tp.List[tp.Tuple[str, ...]]:
        """Lexicon lookup for known words, one batched forward over every
        character position of the OOV words; per-(word,lang) memoized."""
        lang = lang.upper()
        lex = self.lexicon if use_lexicon else {}

        def known(w: str) -> bool:
            key = (lang, normalize_word(w))
            return key in lex or key in self._cache

        todo = sorted({normalize_word(w) for w in words
                       if normalize_word(w) and not known(w)})
        if todo:
            import jax.numpy as jnp

            if self._fwd_jit is None:
                self._fwd_jit = self._build_fwd()
            if self.arch == "gru":
                unk = self.cvocab[UNK_CHAR]
                pad_id = self.cvocab[EOW]
                lid = self.lvocab.get(lang.upper(), 0)
                # one padded word per row (length bucket keeps compiles rare)
                L = 1 << max(3, int(max(len(w) for w in todo) - 1).bit_length())
                B = 1 << max(2, int(len(todo) - 1).bit_length())
                x = np.full((B, L), pad_id, np.int32)
                for i, w in enumerate(todo):
                    x[i, : len(w)] = [self.cvocab.get(c, unk) for c in w]
                logp = np.asarray(self._fwd_jit(
                    jnp.asarray(x), jnp.full((B,), lid, jnp.int32)))
                for i, w in enumerate(todo):
                    pron: tp.List[str] = []
                    for c in self._decode(logp[i, : len(w)]):
                        pron.extend(self.chunk_symbols[c])
                    self._cache[(lang, w)] = tuple(pron)
            else:
                feats = [self._features(w, lang) for w in todo]
                flat = np.concatenate(feats)
                # pad to a power-of-two bucket so the jit compiles once per bucket
                bucket = 1 << max(4, int(len(flat) - 1).bit_length())
                pad = np.zeros((bucket - len(flat), self.win + 1), np.int32)
                logp = np.asarray(self._fwd_jit(jnp.asarray(
                    np.concatenate([flat, pad]))))[: len(flat)]
                ofs = 0
                for w, f in zip(todo, feats):
                    pron = []
                    for c in self._decode(logp[ofs: ofs + len(f)]):
                        pron.extend(self.chunk_symbols[c])
                    self._cache[(lang, w)] = tuple(pron)
                    ofs += len(f)
        out = []
        for w in words:
            key = (lang, normalize_word(w))
            out.append(lex.get(key) or self._cache.get(key, ()))
        return out

    # -- persistence ---------------------------------------------------------

    def save(self, path: tp.Union[str, Path]) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump({"cvocab": self.cvocab, "lvocab": self.lvocab,
                         "chunk_symbols": self.chunk_symbols,
                         "params": self.params, "win": self.win,
                         "lexicon": self.lexicon, "bigrams": self.bigrams,
                         "bigram_weight": self.bigram_weight,
                         "arch": self.arch}, f)
        return path

    @classmethod
    def load(cls, path: tp.Union[str, Path]) -> "G2P":
        with open(path, "rb") as f:
            tree = pickle.load(f)
        return cls(tree["cvocab"], tree["lvocab"], tree["chunk_symbols"],
                   tree["params"], tree.get("win", 7), tree.get("lexicon"),
                   bigrams=tree.get("bigrams"),
                   bigram_weight=tree.get("bigram_weight", 0.0),
                   arch=tree.get("arch", "mlp"))


def train_g2p(
    lexicon: Lexicon,
    win: int = 7,
    char_dim: int = 24,
    hidden: int = 384,
    dropout: float = 0.3,
    label_smooth: float = 0.1,
    steps: int = 1200,
    lr: float = 3e-3,
    weight_decay: float = 1e-3,
    align_iters: int = 3,
    seed: int = 0,
    ensemble: int = 3,
    bigram_weight: float = 0.0,
    bigram_smooth: float = 0.1,
    arch: str = "gru",
    gru_hidden: int = 64,
) -> G2P:
    """Align the lexicon, then train the per-grapheme chunk tagger.

    Two architectures (``arch``):

    - ``"gru"`` (default): full-word bidirectional GRU — every position sees
      the whole word, which stress assignment (EN) and stress-dependent vowel
      reduction (RU akanie) require.  Measured on the mini-corpus lexicon
      (254 aligned word types after the BOS/EOS mining fix): 3-fold CV
      PER 0.250 / word exact-match 0.33, canonical split (seed 0) 0.282/0.32,
      vs 0.308/0.28 for the round-4 window MLP on the same data.
      ``gru_hidden=64`` won a swept 48/64/96/128 grid; splice augmentation
      of the aligned lexicon was tried and measured NOT to help (it corrupts
      whole-word stress patterns).  PER <=0.12 (production phonemizer level)
      is not reachable from a ~230-word training lexicon — the honest path
      there is more data through LibriSpeechDSParser, not a bigger model.
    - ``"mlp"``: the round-4 7-char window classifier, kept for comparison.

    Training is full-batch (a corpus lexicon is a few thousand positions),
    the whole ``steps``-step AdamW loop runs as ONE ``lax.scan`` program —
    ~8 s/member on a single CPU core vs ~97 s for the round-4 host loop.
    The chunk-bigram Viterbi decode is implemented but ships OFF
    (bigram_weight=0): at a ~250-word lexicon the bigram is too sparse and
    *hurts* (PER 0.29 measured) — revisit on corpora with >10k word types."""
    import jax
    import jax.numpy as jnp
    import optax

    aligns = align_lexicon(lexicon, iters=align_iters)

    half = win // 2
    chars = sorted({c for _, w, _ in lexicon for c in w})
    cvocab = {c: i for i, c in enumerate(chars + [BOW, EOW, UNK_CHAR])}
    langs = sorted({l.upper() for l, _, _ in lexicon})
    lvocab = {l: i for i, l in enumerate(langs)}

    chunk_ids: tp.Dict[tp.Tuple[str, ...], int] = {}
    X, Y = [], []
    words_aligned: tp.List[tp.Tuple[str, str, tp.List[int]]] = []  # (lang, word, classes)
    class_seqs: tp.List[tp.List[int]] = []  # per aligned word, for bigrams
    for (l, w, _), chunks in zip(lexicon, aligns):
        if chunks is None:
            continue
        padded = BOW * half + w + EOW * half
        seq = []
        for i, ch in enumerate(chunks):
            X.append([cvocab[padded[i + k]] for k in range(win)]
                     + [lvocab[l.upper()]])
            cid = chunk_ids.setdefault(ch, len(chunk_ids))
            Y.append(cid)
            seq.append(cid)
        class_seqs.append(seq)
        words_aligned.append((l.upper(), w, seq))
    if not X:
        raise ValueError("no alignable entries in the lexicon")

    NC, NL, NCH = len(cvocab), len(lvocab), len(chunk_ids)

    # chunk-class bigram (add-k smoothed log-probs) for the Viterbi decode
    S = np.full(NCH, bigram_smooth, np.float64)
    T = np.full((NCH, NCH), bigram_smooth, np.float64)
    for seq in class_seqs:
        S[seq[0]] += 1.0
        for a, b in zip(seq, seq[1:]):
            T[a, b] += 1.0
    logS = np.log(S / S.sum()).astype(np.float32)
    logT = np.log(T / T.sum(1, keepdims=True)).astype(np.float32)

    tx = optax.adamw(lr, weight_decay=weight_decay)

    if arch == "gru":
        Lmax = max(len(w) for _, w, _ in words_aligned)
        W = len(words_aligned)
        pad_id = cvocab[EOW]
        Xw = np.full((W, Lmax), pad_id, np.int32)
        Yw = np.zeros((W, Lmax), np.int32)
        Mw = np.zeros((W, Lmax), np.float32)
        Lw = np.zeros(W, np.int32)
        for i, (l, w, seq) in enumerate(words_aligned):
            Xw[i, : len(w)] = [cvocab[c] for c in w]
            Yw[i, : len(w)] = seq
            Mw[i, : len(w)] = 1.0
            Lw[i] = lvocab[l]
        jx, jy, jm, jl = map(jnp.asarray, (Xw, Yw, Mw, Lw))

        def loss_of(p, k):
            logits = _gru_forward(p, jx, jl, dropout, k)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, jy[..., None], -1)[..., 0]
            nll = (nll * jm).sum() / jm.sum()
            mean_lp = (logp.mean(-1) * jm).sum() / jm.sum()
            return (1 - label_smooth) * nll - label_smooth * mean_lp

        def init_params(r):
            def mat(fan_in, *shape):
                return jnp.asarray(r.standard_normal(shape) / np.sqrt(fan_in),
                                   jnp.float32)

            D, H = char_dim, gru_hidden
            p = {"ce": 0.1 * mat(1, NC, D), "le": 0.1 * mat(1, NL, D),
                 "w1": mat(2 * H, 2 * H, 2 * H), "b1": jnp.zeros(2 * H),
                 "wo": mat(2 * H, 2 * H, NCH), "bo": jnp.zeros(NCH)}
            for d in ("f_", "b_"):
                for g in ("z", "r", "n"):
                    p[d + "W" + g] = mat(D, D, H)
                    p[d + "U" + g] = mat(H, H, H)
                    p[d + "b" + g] = jnp.zeros(H)
            return p
    else:
        jx = jnp.asarray(np.asarray(X, np.int32))
        jy = jnp.asarray(np.asarray(Y, np.int32))

        def loss_of(p, k):
            logits = _mlp_forward(p, jx, win, dropout, k)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, jy[:, None], -1).mean()
            return (1 - label_smooth) * nll - label_smooth * logp.mean()

        def init_params(r):
            def mat(fan_in, *shape):
                return jnp.asarray(r.standard_normal(shape) / np.sqrt(fan_in),
                                   jnp.float32)

            return {
                "ce": 0.1 * mat(1, NC, char_dim),
                "le": 0.1 * mat(1, NL, char_dim),
                "w1": mat(win * char_dim, win * char_dim + char_dim, hidden),
                "b1": jnp.zeros(hidden),
                "w2": mat(hidden, hidden, hidden),
                "b2": jnp.zeros(hidden),
                "wo": mat(hidden, hidden, NCH),
                "bo": jnp.zeros(NCH),
            }

    @jax.jit
    def run(params, opt_state, key):
        # the full optimization as one scan: ~steps× fewer host dispatches
        # than a python step loop (measured 97 s -> 8 s per member on 1 core)
        def body(carry, i):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_of)(
                p, jax.random.fold_in(key, i))
            upd, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, upd), o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps))
        return params, losses

    members: tp.List[dict] = []
    for m in range(max(1, ensemble)):
        mseed = seed + 1000 * m
        params = init_params(np.random.default_rng(mseed))
        params, _ = run(params, tx.init(params), jax.random.PRNGKey(mseed))
        members.append(jax.tree.map(np.asarray, params))

    chunk_symbols = [()] * NCH
    for ch, i in chunk_ids.items():
        chunk_symbols[i] = ch
    g2p = G2P(cvocab, lvocab, chunk_symbols,
              members if len(members) > 1 else members[0], win=win,
              bigrams=(logS, logT), bigram_weight=bigram_weight, arch=arch)
    g2p.lexicon = {(l.upper(), w): pron for l, w, pron in lexicon}
    return g2p

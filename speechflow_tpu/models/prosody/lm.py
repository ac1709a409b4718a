"""Trainable word-embedding language model (skip-gram with negative sampling).

The reference conditions prosody prediction and the acoustic model on
BERT-class word embeddings (nlp/prosody_prediction/models/prosody_model.py:24,
tts_text_processors.py:895 add_lm_feat). No pretrained LM is downloadable in
this zero-egress environment, so the framework trains its own distributional
word embeddings on the target corpus: a classic skip-gram objective with
negative sampling — one embedding matmul per step, entirely jit-compiled, so
even large corpora train in seconds on a TPU chip.

The trained table backs (a) the ``add_lm_feat`` data handler (replacing the
char-ngram hashing fallback with learned semantics) and (b) the prosody
model's word embedding, via a corpus vocabulary with a char-ngram OOV path.
"""

from __future__ import annotations

import pickle
import re
import typing as tp
from collections import Counter
from pathlib import Path

import numpy as np

__all__ = ["WordLM", "train_word_lm", "train_token_lm", "tokenize_words"]

_WORD_RE = re.compile(r"[\w']+", re.UNICODE)


def tokenize_words(text: str) -> tp.List[str]:
    return [w.lower() for w in _WORD_RE.findall(text)]


class WordLM:
    """Vocabulary + trained embedding table with a char-ngram OOV fallback."""

    def __init__(self, vocab: tp.Dict[str, int], embeddings: np.ndarray):
        self.vocab = vocab
        self.embeddings = embeddings.astype(np.float32)
        self.dim = embeddings.shape[1]

    def _oov_vector(self, word: str) -> np.ndarray:
        """Deterministic char-ngram mix of in-vocab rows: unseen words land
        near morphologically similar seen words instead of at random."""
        import hashlib

        grams = [word[i : i + 3] for i in range(max(len(word) - 2, 1))]
        vec = np.zeros(self.dim, np.float32)
        n_rows = len(self.embeddings)
        for g in grams:
            h = int.from_bytes(hashlib.blake2s(g.encode(), digest_size=4).digest(),
                               "little")
            vec += self.embeddings[h % n_rows]
        return vec / np.sqrt(max(len(grams), 1))

    def embed(self, words: tp.Sequence[str]) -> np.ndarray:
        out = np.zeros((len(words), self.dim), np.float32)
        for i, w in enumerate(words):
            w = w.lower()
            idx = self.vocab.get(w)
            out[i] = self.embeddings[idx] if idx is not None else self._oov_vector(w)
        norms = np.linalg.norm(out, axis=-1, keepdims=True)
        return out / np.maximum(norms, 1e-9)

    def token_ids(self, words: tp.Sequence[str], oov_id: int = 0) -> np.ndarray:
        return np.asarray([self.vocab.get(w.lower(), oov_id) for w in words],
                          np.int32)

    def similarity(self, a: str, b: str) -> float:
        va, vb = self.embed([a])[0], self.embed([b])[0]
        return float(va @ vb)

    # -- persistence ---------------------------------------------------------

    def save(self, path: tp.Union[str, Path]) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump({"vocab": self.vocab, "embeddings": self.embeddings}, f)
        return path

    @classmethod
    def load(cls, path: tp.Union[str, Path]) -> "WordLM":
        with open(path, "rb") as f:
            tree = pickle.load(f)
        return cls(tree["vocab"], tree["embeddings"])


def train_word_lm(
    texts: tp.Iterable[str],
    dim: int = 32,
    window: int = 3,
    min_count: int = 1,
    max_vocab: int = 20000,
    n_negatives: int = 8,
    epochs: int = 60,
    batch_size: int = 1024,
    lr: float = 0.05,
    seed: int = 0,
) -> WordLM:
    """Skip-gram with negative sampling, fully jit-compiled.

    The (center, context) pair list is materialized once on host; each step
    gathers a batch, samples negatives from the unigram^0.75 distribution and
    takes one SGD step on the standard SGNS logistic loss.
    """
    sentences = [tokenize_words(t) for t in texts]
    return train_token_lm(sentences, dim=dim, window=window, min_count=min_count,
                          max_vocab=max_vocab, n_negatives=n_negatives,
                          epochs=epochs, batch_size=batch_size, lr=lr, seed=seed)


def train_token_lm(
    sentences: tp.Sequence[tp.Sequence[str]],
    dim: int = 32,
    window: int = 3,
    min_count: int = 1,
    max_vocab: int = 20000,
    n_negatives: int = 8,
    epochs: int = 60,
    batch_size: int = 1024,
    lr: float = 0.05,
    seed: int = 0,
) -> WordLM:
    """Skip-gram over arbitrary token sequences (words, phonemes, ...).

    Phoneme sequences give the XPhoneBERT-equivalent: distributional phoneme
    embeddings for `xpbert_feat` (reference: tts_text_processors.py:782
    XPBertProcessor)."""
    import jax
    import jax.numpy as jnp

    sentences = [[str(w).lower() for w in s] for s in sentences]
    counts = Counter(w for s in sentences for w in s)
    words = [w for w, c in counts.most_common(max_vocab) if c >= min_count]
    vocab = {w: i + 1 for i, w in enumerate(words)}  # 0 = OOV/PAD
    v = len(vocab) + 1

    centers, contexts = [], []
    for s in sentences:
        ids = [vocab.get(w, 0) for w in s]
        for i, c in enumerate(ids):
            if c == 0:
                continue
            for j in range(max(0, i - window), min(len(ids), i + window + 1)):
                if j != i and ids[j] != 0:
                    centers.append(c)
                    contexts.append(ids[j])
    if not centers:
        return WordLM(vocab, np.zeros((v, dim), np.float32))
    centers = np.asarray(centers, np.int32)
    contexts = np.asarray(contexts, np.int32)

    # unigram^0.75 negative-sampling table
    freq = np.zeros(v, np.float64)
    for w, i in vocab.items():
        freq[i] = counts[w]
    neg_p = freq**0.75
    neg_p = neg_p / neg_p.sum()

    rng = np.random.default_rng(seed)
    emb_in = (rng.standard_normal((v, dim)) / np.sqrt(dim)).astype(np.float32)
    emb_out = np.zeros((v, dim), np.float32)
    params = (jnp.asarray(emb_in), jnp.asarray(emb_out))

    @jax.jit
    def step(params, c_ids, ctx_ids, neg_ids):
        def loss_fn(p):
            e_in, e_out = p
            vc = e_in[c_ids]                       # (B, D)
            vo = e_out[ctx_ids]                    # (B, D)
            vn = e_out[neg_ids]                    # (B, K, D)
            pos = jax.nn.log_sigmoid(jnp.sum(vc * vo, -1))
            neg = jnp.sum(jax.nn.log_sigmoid(-jnp.einsum("bd,bkd->bk", vc, vn)), -1)
            return -jnp.mean(pos + neg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new = tuple(p - lr * g for p, g in zip(params, grads))
        return new, loss

    n_pairs = len(centers)
    steps_per_epoch = max(n_pairs // batch_size, 1)
    for _ in range(epochs):
        perm = rng.permutation(n_pairs)
        for s in range(steps_per_epoch):
            idx = perm[s * batch_size : (s + 1) * batch_size]
            if len(idx) < 8:
                continue
            negs = rng.choice(v, size=(len(idx), n_negatives), p=neg_p)
            params, _ = step(params, jnp.asarray(centers[idx]),
                             jnp.asarray(contexts[idx]),
                             jnp.asarray(negs.astype(np.int32)))

    return WordLM(vocab, np.asarray(params[0]))

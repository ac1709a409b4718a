"""Prosody-prediction training CLI (reference: nlp/prosody_prediction/scripts).

Trains the word-level contour classifier on TextGridStage3 segas whose
``prosody`` tier was produced by the annotator/dump clustering. Words are
tokenized with the hash vocabulary; labels: binary (has contour) + category.

Usage:
  python -m speechflow_tpu.scripts.train_prosody -cd configs/tts_data_24khz.yml \
      -c configs/prosody_model.yml -vs debug [--data_root ...]
"""

from __future__ import annotations

import logging
import typing as tp

import numpy as np
from flax import nnx

from speechflow_tpu.logging import LoggingServer
from speechflow_tpu.models.prosody import ProsodyCriterion, ProsodyModel, ProsodyParams
from speechflow_tpu.models.prosody.interface import hash_tokenize
from speechflow_tpu.scripts.common import (
    config_prepare,
    optimizer_config,
    train_arguments,
    trainer_config,
)
from speechflow_tpu.training import Trainer

LOGGER = logging.getLogger("speechflow_tpu")


class ProsodySampleLoader:
    """Serves (token_ids, labels) batches from segas' text/prosody tiers."""

    def __init__(self, data_root: str, vocab_size: int, batch_size: int = 16,
                 max_len: int = 64, seed: int = 0):
        from speechflow_tpu.io import AudioSeg, construct_file_list

        self.items = []
        for f in construct_file_list(data_root, ext=".TextGridStage3"):
            seg = AudioSeg.load(f)
            words = [w for _, _, w in seg.words()]
            if not words:
                continue
            prosody = None
            if "prosody" in seg.grid:
                labels = seg.grid["prosody"].non_empty().labels
                prosody = labels if len(labels) == len(words) else None
            self.items.append((words, prosody))
        self.vocab_size = vocab_size
        self.batch_size = batch_size
        self.max_len = max_len
        self.rng = np.random.default_rng(seed)
        self.vocab: tp.Optional[dict] = None

    def set_vocab(self, vocab: dict) -> None:
        """Switch from hash ids to a trained WordLM vocabulary (0 = OOV)."""
        self.vocab = vocab

    def _tokenize(self, words):
        if self.vocab is not None:
            return np.asarray([self.vocab.get(w.lower(), 0) for w in words], np.int32)
        return hash_tokenize(words, self.vocab_size)

    def next_batch(self):
        idx = self.rng.integers(0, len(self.items), self.batch_size)
        ids = np.zeros((self.batch_size, self.max_len), np.int32)
        binary = np.full((self.batch_size, self.max_len), -1, np.int32)
        category = np.full((self.batch_size, self.max_len), -1, np.int32)
        lens = np.zeros((self.batch_size,), np.int32)
        for r, i in enumerate(idx):
            words, prosody = self.items[int(i)]
            n = min(len(words), self.max_len)
            ids[r, :n] = self._tokenize(words[:n])
            lens[r] = n
            # shared with ProsodyParser so registry-driven pipelines and this
            # loader emit identical targets
            from speechflow_tpu.data.parsers import prosody_targets

            b, c = prosody_targets(words[:n], prosody[:n] if prosody else None)
            binary[r, :n] = b
            category[r, :n] = c
        return {"token_ids": ids, "lengths": lens, "binary": binary, "category": category}


def main(argv=None) -> str:
    args = train_arguments().parse_args(argv)
    model_cfg, data_cfg, saver = config_prepare(args)
    with LoggingServer.ctx(saver.expr_path):
        params = ProsodyParams.create(model_cfg.section("model").to_dict())
        model = ProsodyModel(params, rngs=nnx.Rngs(0))
        saver.to_save["model_params"] = params.to_dict()
        loader = ProsodySampleLoader(
            data_cfg.get_path("dirs.data_root"),
            params.vocab_size,
            batch_size=int(model_cfg.get_path("batch.size", 16)),
        )
        if params.tokenizer == "word_lm":
            # train distributional word embeddings on the corpus text, embed
            # the vocab in the checkpoint payload, warm-start the embed table
            from speechflow_tpu.models.prosody.lm import train_word_lm

            texts = [" ".join(words) for words, _ in loader.items]
            lm = train_word_lm(texts, dim=min(params.dim, 64),
                               max_vocab=params.vocab_size - 1,
                               epochs=int(model_cfg.get_path("model.lm_epochs", 30)))
            lm.save(saver.expr_path / "word_lm.pkl")
            saver.to_save["word_lm_vocab"] = lm.vocab
            model.warmstart_embeddings(lm.embeddings)
            loader.set_vocab(lm.vocab)
            LOGGER.info("word LM trained: %d words in vocab", len(lm.vocab))
        trainer = Trainer(
            model, ProsodyCriterion(),
            lambda b: ({"token_ids": b["token_ids"], "lengths": b["lengths"]},
                       {"binary": b["binary"], "category": b["category"]}),
            optimizer_config(model_cfg), trainer_config(model_cfg), saver=saver)
        last = trainer.fit(loader)
        LOGGER.info("prosody training done: %s", last)
        return str(saver.expr_path)


def cli() -> None:
    """Console entry point (pyproject [project.scripts]): exit-code semantics
    want None, while :func:`main` returns its result for programmatic use."""
    main()


if __name__ == "__main__":
    main()

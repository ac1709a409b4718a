"""Prosody-prediction quality proof (VERDICT r2 next-step #9a).

Runs the real label-producing chain on a tmp copy of the mini corpus — dump
(contour clustering -> centroids) -> prosody_annotation (nearest-centroid
word classes written into the segas) — then trains the word-level classifier
on 80% of utterances and requires held-out accuracy ABOVE STATED BASELINES:
binary accuracy > majority class, category accuracy > chance.  EER is
computed and logged (reference metric, criterion.py:42).  This is the test
that fails if the model silently degrades to a near-random carrier of the
API (VERDICT r2 weak #8)."""

import logging
import os
import shutil
from pathlib import Path

import numpy as np
import pytest
from tests.paths import MINI_SEGS

MINI = f"{MINI_SEGS}"
CFG = Path(__file__).parent.parent / "configs"

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(MINI),
                                 reason="reference mini dataset unavailable")]

LOGGER = logging.getLogger("speechflow_tpu")


@pytest.fixture(scope="module")
def annotated_corpus(tmp_path_factory):
    """tmp corpus with real clustered prosody labels in the segas."""
    from speechflow_tpu.io import Config
    from speechflow_tpu.scripts import dump, prosody_annotation

    root = tmp_path_factory.mktemp("prosody_corpus")
    data = root / "SEGS"
    shutil.copytree(MINI, data)
    # debug shapes, but the whole corpus (the debug cap of 6 samples would
    # leave most segas unannotated and the classifier with nothing to learn)
    cfg = Config.create_from_file(CFG / "tts_data_24khz.yml",
                                  value_select=["debug"])
    cfg.set_path("dataset.max_num_samples", None)
    cfg_path = root / "tts_data.yml"
    cfg.to_file(cfg_path)
    dump.main(["-cd", str(cfg_path),
               "--dump_path", str(root / "dump"), "--data_root", str(data)])
    prosody_annotation.main(["-cd", str(cfg_path),
                             "--dump_path", str(root / "dump"),
                             "--data_root", str(data)])
    return data


def test_heldout_prosody_accuracy_beats_baselines(annotated_corpus):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from speechflow_tpu.models.prosody import ProsodyModel, ProsodyParams
    from speechflow_tpu.models.prosody.criterion import ProsodyCriterion, eer
    from speechflow_tpu.scripts.train_prosody import ProsodySampleLoader

    params = ProsodyParams(vocab_size=2000, n_classes=8, dim=96, n_layers=2,
                           n_heads=4, dropout=0.2, max_len=64)
    loader = ProsodySampleLoader(str(annotated_corpus), params.vocab_size,
                                 batch_size=16, max_len=params.max_len, seed=0)
    items = loader.items
    assert len(items) >= 40
    # utterance-level 80/20 split
    rng = np.random.default_rng(0)
    order = rng.permutation(len(items))
    n_held = len(items) // 5
    held_items = [items[i] for i in order[:n_held]]
    loader.items = [items[i] for i in order[n_held:]]
    # some utterances must carry real contour classes, or the chain is broken
    n_labeled = sum(1 for _, pr in items
                    if pr and any(l not in ("", "undefined", "no", "BOS", "EOS")
                                  for l in pr))
    assert n_labeled > len(items) * 0.3, "prosody_annotation produced no labels"

    model = ProsodyModel(params, rngs=nnx.Rngs(0))
    criterion = ProsodyCriterion()
    opt = nnx.Optimizer(model, optax.adamw(3e-4), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, batch):
        def loss_fn(m):
            out = m({"token_ids": batch["token_ids"], "lengths": batch["lengths"]},
                    training=True)
            losses = criterion(out, {"binary": batch["binary"],
                                     "category": batch["category"]}, 0)
            return sum(losses.values())

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    for i in range(400):
        batch = {k: jnp.asarray(v) for k, v in loader.next_batch().items()}
        loss = step(model, opt, batch)
    assert np.isfinite(float(loss))

    # held-out evaluation
    heldout = ProsodySampleLoader.__new__(ProsodySampleLoader)
    heldout.items = held_items
    heldout.vocab_size = params.vocab_size
    heldout.batch_size = len(held_items)
    heldout.max_len = params.max_len
    heldout.rng = np.random.default_rng(1)
    heldout.vocab = None
    # deterministic full pass: next_batch samples randomly, so index directly
    heldout.rng = np.random.default_rng(1)
    batch = heldout.next_batch()
    out = model({"token_ids": jnp.asarray(batch["token_ids"]),
                 "lengths": jnp.asarray(batch["lengths"])})

    b_tgt = batch["binary"].reshape(-1)
    b_pred = np.asarray(jnp.argmax(out["binary"], -1)).reshape(-1)
    b_score = np.asarray(jax.nn.softmax(out["binary"], -1))[..., 1].reshape(-1)
    m = b_tgt >= 0
    acc_b = float((b_pred[m] == b_tgt[m]).mean())
    majority = float(max((b_tgt[m] == 0).mean(), (b_tgt[m] == 1).mean()))
    e = eer(b_score[m], b_tgt[m])
    LOGGER.info("prosody held-out: binary acc %.3f (majority %.3f), EER %.3f",
                acc_b, majority, e)

    # contour classes are heavily skewed (one dominant contour), so raw
    # accuracy just reflects the majority class; balanced accuracy (mean
    # per-class recall over classes with enough support) is the honest gate —
    # a majority-only predictor scores exactly 1/k on it
    c_tgt = batch["category"].reshape(-1)
    c_pred = np.asarray(jnp.argmax(out["category"], -1)).reshape(-1)
    cm = c_tgt >= 0
    counts = np.bincount(c_tgt[cm], minlength=params.n_classes)
    present = [c for c in range(params.n_classes) if counts[c] >= 5]
    recalls = [float((c_pred[cm & (c_tgt == c)] == c).mean()) for c in present]
    bal_acc = float(np.mean(recalls)) if recalls else 0.0
    chance_bal = 1.0 / max(len(present), 1)
    LOGGER.info("prosody held-out: category balanced acc %.3f over %d classes "
                "(chance %.3f, n=%d)", bal_acc, len(present), chance_bal,
                int(cm.sum()))

    assert acc_b > majority + 0.02, (
        f"binary head no better than majority ({acc_b:.3f} vs {majority:.3f})")
    assert e < 0.5, f"EER {e:.3f} is not better than random"
    if cm.sum() >= 50 and len(present) >= 2:
        assert bal_acc > chance_bal + 0.05, (
            f"category head no better than majority-only "
            f"({bal_acc:.3f} vs chance {chance_bal:.3f})")

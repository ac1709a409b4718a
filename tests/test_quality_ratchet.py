"""Round-over-round quality ratchet (VERDICT r2 next-step #6): a fixed
debug-budget training run must (a) clearly beat the untrained model on
resynthesis mel-L1 over held corpus utterances and (b) not regress past the
committed best (tests/data/quality_ratchet.json, updated only when better by
tests/tools/quality_harness.py).  This is the test that enforces a quality
trend instead of narrating one."""

import json
import os
import sys
from pathlib import Path

import pytest
from tests.paths import MINI_SEGS

sys.path.insert(0, str(Path(__file__).parent / "tools"))

MINI = f"{MINI_SEGS}"

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(MINI),
                                 reason="reference mini dataset unavailable")]


def test_quality_ratchet(tmp_path):
    import quality_harness as qh

    ckpt = qh.train_ratchet_model(tmp_path)
    trained, untrained = qh.eval_checkpoint(ckpt)

    # (a) training moved the model: clear margin over the untrained baseline
    assert trained["mel_l1"] < untrained["mel_l1"] * 0.8, (
        f"{qh.TRAIN_STEPS} steps did not improve over untrained: "
        f"{trained['mel_l1']} vs {untrained['mel_l1']}")
    assert trained["mcd_db"] < untrained["mcd_db"]

    # (b) the committed ratchet: regressions past 15% tolerance fail
    assert qh.RATCHET_PATH.exists(), (
        "run PYTHONPATH=. python tests/tools/quality_harness.py to seed the "
        "ratchet record")
    best = json.loads(qh.RATCHET_PATH.read_text())
    assert trained["mel_l1"] <= best["mel_l1"] * 1.15, (
        f"mel_l1 {trained['mel_l1']} regressed past committed "
        f"{best['mel_l1']} (+15%)")
    assert trained["mcd_db"] <= best["mcd_db"] * 1.15

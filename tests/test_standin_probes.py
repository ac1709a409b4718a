"""Gate on the committed stand-in probe record (r4 VERDICT weak #5 /
next-step #9a).

tests/tools/standin_probes.py linear-probes the zero-egress CPC features for
frame-level phoneme identity against a log-mel baseline on the vendored
corpus and commits docs/standin_probes.json.  This test pins the committed
record: the CPC features must carry real phonetic information (far above the
majority-class floor), and the measured relation to the mel baseline is
recorded — reruns that regress fail."""

import json
from pathlib import Path

import pytest

RECORD = Path(__file__).parent.parent / "docs" / "standin_probes.json"


@pytest.fixture(scope="module")
def record():
    if not RECORD.exists():
        pytest.skip("run PYTHONPATH=. python tests/tools/standin_probes.py")
    return json.loads(RECORD.read_text())


def test_cpc_phone_probe_beats_majority_floor(record):
    probe = record["cpc_phone_probe"]
    cpc = probe["cpc"]
    assert probe["n_phonemes"] >= 20          # a real multi-class problem
    assert cpc["n_test_frames"] >= 2000
    # linear separability of phonemes in CPC space: well above chance
    assert cpc["frame_acc"] >= 2.0 * cpc["majority_floor"], cpc
    assert cpc["frame_acc"] >= 0.20, cpc


def test_cpc_vs_mel_relation_recorded(record):
    """The honest comparison the standins audit demands: both numbers exist
    and the CPC probe is at least in the mel baseline's regime (>= 60% of
    its accuracy) — a CPC collapse (speaker/energy-only features) fails."""
    probe = record["cpc_phone_probe"]
    cpc, mel = probe["cpc"], probe["logmel"]
    assert mel["frame_acc"] > 0
    assert cpc["frame_acc"] >= 0.6 * mel["frame_acc"], (cpc, mel)

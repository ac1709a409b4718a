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


def test_asr_per_probe_recorded(record):
    """Probe B: the CTC ASR stand-in's held-out PER is measured (the number
    docs/standins.md previously listed as unmeasured) and far better than
    an untrained decoder (PER ~1.0)."""
    if "asr_per_probe" not in record:
        pytest.skip("record predates the ASR PER probe")
    probe = record["asr_per_probe"]
    assert probe["n_phonemes"] >= 20 and probe["n_test_utts"] >= 2
    assert probe["per_test"] <= 0.70, probe       # well under random/untrained
    assert probe["per_train"] <= probe["per_test"] + 0.10, probe


def test_codec_bitrate_probe_recorded(record):
    """Probe C: RVQ codec round-trip quality at its real bitrate — training
    must move every metric decisively off the untrained floor."""
    if "codec_bitrate_probe" not in record:
        pytest.skip("record predates the codec bitrate probe")
    probe = record["codec_bitrate_probe"]
    assert 2.0 <= probe["bitrate_kbps"] <= 24.0   # speech-codec regime
    tr, un = probe["trained"], probe["untrained"]
    assert tr["pesq_wb"] >= un["pesq_wb"] + 0.3, probe
    assert tr["si_snr"] >= un["si_snr"] + 5.0, probe
    assert tr["mcd"] <= un["mcd"] * 0.7, probe

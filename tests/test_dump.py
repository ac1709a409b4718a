"""Dump script: feature cache fill, ranges.json, prosody centroids, and
cache-accelerated second pass; StatisticsRange loading from ranges.json."""

import json
import os
import time
from pathlib import Path

import numpy as np
import pytest
from tests.paths import MINI_SEGS

MINI = f"{MINI_SEGS}"
CFG = Path(__file__).parent.parent / "configs" / "tts_data_24khz.yml"

pytestmark = pytest.mark.skipif(not os.path.isdir(MINI), reason="mini dataset unavailable")


def test_dump_script_end_to_end(tmp_path):
    from speechflow_tpu.scripts import dump

    report = dump.main(["-cd", str(CFG), "-vs", "debug",
                        "--dump_path", str(tmp_path / "dump"),
                        "--data_root", MINI])
    assert report["subsets"]["train"] > 0
    ranges = json.loads((tmp_path / "dump" / "ranges.json").read_text())
    assert "LJSpeech" in ranges
    assert "pitch" in ranges["LJSpeech"]
    lo, hi, mean, std = ranges["LJSpeech"]["pitch"]
    assert 80 <= lo < hi <= 880 and 100 < mean < 400
    cents = np.load(tmp_path / "dump" / "prosody_centroids.npy")
    assert cents.shape[1] == 10 and len(cents) >= 1

    # second pass: cache hits make preproc much faster
    from speechflow_tpu.data.core.components import DataPipeline
    from speechflow_tpu.io import Config

    cfg = Config.create_from_file(CFG, value_select=["debug"])
    cfg.set_path("dirs.data_root", MINI)
    cfg.set_path("processor.dump.dump_path", str(tmp_path / "dump"))
    cfg.set_path("processor.dump.full_dump", True)
    # StatisticsRange now loads the dumped ranges
    cfg["singleton_handlers"] = {
        "SpeakerIDSetter": {},
        "StatisticsRange": {"ranges_file": str(tmp_path / "dump" / "ranges.json")},
        "DatasetStatistics": {},
        "PhonemeStatistics": {},
    }
    dp = DataPipeline(cfg).init_components()
    sr = dp["train"].singletons["StatisticsRange"]
    assert sr.get("pitch", "LJSpeech")[0] >= 80

    t0 = time.time()
    batch = dp["train"].sample_batch(2)
    cached_time = time.time() - t0
    assert batch is not None and batch.collated_samples.mel is not None
    assert cached_time < 5.0, f"cache pass too slow: {cached_time:.1f}s"

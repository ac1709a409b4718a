"""2-stage forced-alignment recipe: per-stage data semantics (fast tier).

The reference trains stage 2 on stage-1 OUTPUTS with different pipeline
semantics (configs/2stage/data_stage{1,2}.yml, SURVEY A.3):

  stage 1: raw .TextGrid (word tier only) -> phonemize -> pauses FROM TEXT,
           service tokens ON, strip pad 0.25
  stage 2: .TextGridStage1 -> pauses FROM TIMESTAMPS (min_len 0.03),
           anomalous-phoneme filter, service tokens OFF, strip pad 0.15

These tests pin the per-stage behavior without training; the slow-tier
test_annotator_two_stage.py drives the full runner.
"""

from pathlib import Path

import numpy as np
import pytest
from tests.paths import MINI_SEGS

SEGS = Path(f"{MINI_SEGS}/EN/LJSpeech/000")
CFG_DIR = Path(__file__).parent.parent / "configs"

pytestmark = pytest.mark.skipif(not SEGS.is_dir(), reason="mini corpus unavailable")


@pytest.fixture(scope="module")
def stage_corpora(tmp_path_factory):
    """stage-1 input: text-tier-only .TextGrid; stage-2 input: a synthetic
    .TextGridStage1 with phoneme timestamps that include a long real pause."""
    import shutil

    from speechflow_tpu.io import AudioSeg, TextGrid, Tier

    root = tmp_path_factory.mktemp("fa2")
    for f in sorted(SEGS.glob("*.TextGridStage3"))[:4]:
        seg = AudioSeg.load(f)
        wav = f.parent / (f.name.split(".")[0] + ".wav")
        shutil.copy(wav, root / wav.name)

        grid = TextGrid(seg.grid.xmin, seg.grid.xmax)
        for t in seg.grid.tiers:
            if t.name == "text":
                grid.add(t)
        seg.grid = grid
        seg.audio_chunk.file_path = root / wav.name
        seg.save(root / (f.name.split(".")[0] + ".TextGrid"))

        # synthetic stage-1 grid: real phoneme tier from the Stage3 source
        seg3 = AudioSeg.load(f)
        seg3.audio_chunk.file_path = root / wav.name
        seg3.save(root / (f.name.split(".")[0] + ".TextGridStage1"))
    return root


def _build(config: str, root: Path):
    from speechflow_tpu.data.core.components import DataPipeline
    from speechflow_tpu.io import Config

    cfg = Config.create_from_file(CFG_DIR / config, value_select=["debug"])
    cfg.set_path("dirs.data_root", str(root))
    cfg.set_path("dataset.max_num_samples", 4)
    return DataPipeline(cfg).init_components()


def test_stage1_pipeline_semantics(stage_corpora):
    pipe = _build("aligner_data_stage1.yml", stage_corpora)
    comp = pipe[pipe.subsets[0]]
    assert len(comp.dataset) > 0
    # raw segs have no phoneme tier; phonemize fills them during preproc
    assert not comp.dataset[0].phonemes
    batch = comp.datasample_to_batch([comp.dataset[0]])
    ds = batch.data_samples[0]
    syms = pipe.alphabet.decode(np.asarray(ds.transcription))
    # service tokens ON (stage-1 config)
    assert syms[0] == "<BOS>" and syms[-1] == "<EOS>"
    # pauses inserted from text between words
    assert "<SIL>" in syms[1:-1]
    # every non-service symbol came from the text phonemization
    assert all(len(s) == 1 or s.startswith("<") for s in syms)


def test_stage2_pipeline_semantics(stage_corpora):
    pipe = _build("aligner_data_stage2.yml", stage_corpora)
    comp = pipe[pipe.subsets[0]]
    assert len(comp.dataset) > 0
    # stage-1 grids carry phoneme timestamps
    ds0 = comp.dataset[0]
    assert ds0.phonemes and ds0.phoneme_timestamps is not None
    batch = comp.datasample_to_batch([comp.dataset[0]])
    ds = batch.data_samples[0]
    syms = pipe.alphabet.decode(np.asarray(ds.transcription))
    # service tokens OFF (stage-2 config)
    assert "<BOS>" not in syms and "<EOS>" not in syms
    # pauses come from the TIMESTAMPS (gaps/empty intervals -> SIL)
    assert "<SIL>" in syms
    # SIL token count equals pause intervals >= min_len (+ boundary pauses)
    n_sil = sum(1 for s in syms if s == "<SIL>")
    assert n_sil >= 2  # BOS/EOS silence region at least


def test_stage_strip_pads_differ(stage_corpora):
    p1 = _build("aligner_data_stage1.yml", stage_corpora)
    p2 = _build("aligner_data_stage2.yml", stage_corpora)
    assert p1[p1.subsets[0]].parser.audio_strip_pad == 0.25
    assert p2[p2.subsets[0]].parser.audio_strip_pad == 0.15
    assert p2[p2.subsets[0]].parser.max_phoneme_length is not None


def test_align_stage_input_ext():
    from speechflow_tpu.annotator.align import AlignStage

    assert AlignStage.stage1.input_ext == ".TextGrid"
    assert AlignStage.stage2.input_ext == ".TextGridStage1"
    assert AlignStage.stage3.input_ext == ".TextGridStage2"

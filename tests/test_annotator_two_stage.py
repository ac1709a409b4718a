"""End-to-end 2-stage forced-alignment recipe (slow tier).

Drives the annotator runner's step 2 (train stage 1 on raw ``.TextGrid`` ->
align -> ``.TextGridStage1`` -> train stage 2 on the stage-1 OUTPUT ->
align -> ``.TextGridStage2``) on a synthetic tone corpus where alignment is
learnable in a few hundred debug steps: every character is a fixed-frequency
tone, so the aligner only has to learn a char->spectrum lookup. Inter-word
silences are inserted at KNOWN positions, giving exact ground truth for the
stage-2 claim (reference README.md:203-204): stage-2 grids carry SIL
intervals at the real acoustic silences, which stage-1 (pauses from text,
uniformly between all words) cannot represent.

Quality numbers on the real LJSpeech mini corpus (1500+600 steps on TPU,
recorded in docs/history.md): stage-2 SIL-energy ratio 0.19 vs stage-1 0.27,
reference-pause recall 0.83 vs 0.78, SILs/utt 3.8 vs 9.3.
"""

import os
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SR = 24000
CHAR_FREQS = {c: 250.0 + 150.0 * i for i, c in enumerate("abcdefgh")}
CHAR_DUR = 0.12
GAP_DUR = 0.35


def _tone(freq: float, dur: float, rng) -> np.ndarray:
    t = np.arange(int(dur * SR)) / SR
    sig = np.sin(2 * np.pi * freq * t) + 0.3 * np.sin(2 * np.pi * 2 * freq * t)
    env = np.minimum(1.0, np.minimum(np.arange(len(t)), np.arange(len(t))[::-1]) / (0.01 * SR))
    return (0.3 * sig * env + 0.003 * rng.standard_normal(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def tone_corpus(tmp_path_factory):
    """8 utterances; ~half contain one real inter-word silence (known pos)."""
    from speechflow_tpu.io import AudioChunk, AudioSeg, TextGrid, Tier

    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("tone_corpus")
    words_pool = ["abc", "de", "fgh", "cad", "beg", "fa"]
    gaps = {}
    for u in range(8):
        n_words = int(rng.integers(2, 4))
        words = [words_pool[int(rng.integers(len(words_pool)))] for _ in range(n_words)]
        gap_after = int(rng.integers(0, n_words - 1)) if u % 2 == 0 else None

        pieces = [np.zeros(int(0.2 * SR), np.float32)]
        word_ts = []
        cur = 0.2
        for w_i, w in enumerate(words):
            wb = cur
            for ch in w:
                pieces.append(_tone(CHAR_FREQS[ch], CHAR_DUR, rng))
                cur += CHAR_DUR
            word_ts.append((wb, cur, w))
            if w_i == gap_after:
                pieces.append(np.zeros(int(GAP_DUR * SR), np.float32))
                gaps[u] = (cur, cur + GAP_DUR)
                cur += GAP_DUR
        pieces.append(np.zeros(int(0.2 * SR), np.float32))
        cur += 0.2
        wav = np.concatenate(pieces)
        AudioChunk(data=wav, sr=SR).save(root / f"{u}.wav")

        grid = TextGrid(0.0, cur)
        grid.add(Tier("text", [(b, e, lab) for b, e, lab in word_ts]))
        seg = AudioSeg(AudioChunk(file_path=root / f"{u}.wav"), grid)
        seg.meta["speaker_name"] = "tone"
        seg.meta["lang"] = "EN"
        seg.save(root / f"{u}.TextGrid")
    return root, gaps


@pytest.fixture(scope="module")
def two_stage_run(tone_corpus, tmp_path_factory):
    """Run the runner's step 2 (both stages) with a small step budget."""
    from speechflow_tpu.annotator import runner
    from speechflow_tpu.io import Config

    root, gaps = tone_corpus
    out = tmp_path_factory.mktemp("fa_out")
    cfg_dir = Path(__file__).parent.parent / "configs"
    cfg = Config.create_from_file(cfg_dir / "aligner_model.yml", value_select=["debug"])
    cfg.set_path("experiment.base_dir", str(out / "experiments"))
    cfg.set_path("trainer.max_steps", 400)
    cfg.set_path("trainer.ckpt_every", 400)
    cfg.set_path("optimizer.lr", 0.002)
    mpath = out / "aligner_model.yml"
    cfg.to_file(mpath)

    report = runner.main([
        "-d", str(root), "-o", str(out), "--steps", "2",
        "--aligner_config", str(mpath), "-vs", "debug",
        "--max_steps", "400",
    ])
    return root, gaps, out, report


def test_stage_outputs_emitted(two_stage_run):
    root, gaps, out, report = two_stage_run
    s1 = sorted(root.glob("*.TextGridStage1"))
    s2 = sorted(root.glob("*.TextGridStage2"))
    assert len(s1) >= 6, [p.name for p in s1]
    assert len(s2) >= 4, [p.name for p in s2]


def test_stage2_trained_on_stage1_output(two_stage_run):
    """The stage-2 experiment's data config must consume .TextGridStage1 —
    the defining property of the reference 2-stage recipe
    (2stage/data_stage2.yml + runner.py:691-713)."""
    root, gaps, out, report = two_stage_run
    exps = sorted((out / "experiments").iterdir())
    assert len(exps) >= 2
    data_yml = (exps[-1] / "data.yml").read_text()
    assert ".TextGridStage1" in data_yml
    assert "add_pauses_from_timestamps" in data_yml
    stage1_yml = (exps[0] / "data.yml").read_text()
    assert "add_pauses_from_text" in stage1_yml


def test_stage2_grids_differ_from_stage1(two_stage_run):
    from speechflow_tpu.io import AudioSeg

    root, gaps, out, report = two_stage_run
    n_sil1, n_sil2, diff = [], [], 0
    for f2 in sorted(root.glob("*.TextGridStage2")):
        f1 = f2.with_suffix("").with_suffix(".TextGridStage1")
        if not f1.exists():
            continue
        phs1 = AudioSeg.load(f1).phonemes()
        phs2 = AudioSeg.load(f2).phonemes()
        if [iv[2] for iv in phs1] != [iv[2] for iv in phs2] or \
           not np.allclose([iv[0] for iv in phs1][: len(phs2)],
                           [iv[0] for iv in phs2][: len(phs1)], atol=1e-3):
            diff += 1
        n_sil1.append(sum(1 for iv in phs1 if not iv[2]))
        n_sil2.append(sum(1 for iv in phs2 if not iv[2]))
    assert diff >= 1, "stage-2 grids identical to stage-1"
    # stage 2 keeps only timestamp-backed pauses (min_len + small-pause
    # removal): strictly fewer SIL intervals than text-inserted stage 1
    assert np.mean(n_sil2) < np.mean(n_sil1), (n_sil1, n_sil2)


def test_stage2_sils_land_on_real_silences(two_stage_run):
    """On utterances with a known inserted gap, a stage-2 SIL >= 100 ms must
    overlap it, and SIL intervals must be low-energy vs the utterance."""
    from speechflow_tpu.io import AudioSeg

    root, gaps, out, report = two_stage_run
    hits, total, ratios = 0, 0, []
    for u, (gb, ge) in gaps.items():
        f2 = root / f"{u}.TextGridStage2"
        if not f2.exists():
            continue
        seg = AudioSeg.load(f2)
        wav = np.asarray(seg.audio_chunk.load(sr=SR).waveform, np.float64)
        rms_all = np.sqrt((wav ** 2).mean()) + 1e-9
        sils = [(b, e) for b, e, lab in seg.phonemes() if not lab and e - b >= 0.1]
        total += 1
        mid = 0.5 * (gb + ge)
        if any(sb - 0.1 <= mid <= se + 0.1 for sb, se in sils):
            hits += 1
        for b, e in sils:
            s = wav[int(b * SR):int(e * SR)]
            if len(s):
                ratios.append(np.sqrt((s ** 2).mean()) / rms_all)
    assert total >= 2, "too few stage-2 grids with known gaps survived"
    assert hits / total >= 0.5, f"gap recall {hits}/{total}"
    assert np.mean(ratios) < 0.6, f"SIL energy ratio {np.mean(ratios):.2f}"

"""Data pipeline core tests: registry contracts, processor chain, dump cache,
samplers, collate bucketing, and the end-to-end config-driven pipeline over
the reference mini dataset."""

import functools
from pathlib import Path

import numpy as np
import pytest

from speechflow_tpu.data.collate import TTSCollate
from speechflow_tpu.data.core import (
    Batch,
    DataPipeline,
    DataProcessor,
    Dataset,
    DataSample,
    DumpProcessor,
    PipeRegistry,
)
from speechflow_tpu.data.samplers import RandomSampler, SimpleSampler, WeightedSampler
from speechflow_tpu.io import Config
from tests.paths import MINI_SEGS

CFG_PATH = Path(__file__).parent.parent / "configs" / "tts_data_24khz.yml"


# ------------------------------------------------------------------ registry


def test_pipe_registry_check_and_filter():
    @PipeRegistry.registry(inputs={"a"}, outputs={"b"})
    def f1(ds):
        return ds

    @PipeRegistry.registry(inputs={"b"}, outputs={"c"})
    def f2(ds):
        return ds

    assert PipeRegistry.check([f1, f2], initial_fields={"a"})
    with pytest.raises(ValueError):
        PipeRegistry.check([f2, f1], initial_fields={"a"})

    assert PipeRegistry.filter([f1, f2], drop_names={"f2"}) == [f1]
    assert PipeRegistry.filter([f1, f2], drop_fields={"c"}) == [f1]
    assert PipeRegistry.filter([f1, f2], before="f2") == [f1]
    assert PipeRegistry.filter([f1, f2], after="f1") == [f2]


# ------------------------------------------------------------------ processor + dump


def test_data_processor_chain_and_dump(tmp_path):
    calls = {"n": 0}

    @PipeRegistry.registry(outputs={"label"})
    def expensive(ds):
        calls["n"] += 1
        ds.label = "computed"
        return ds

    dump = DumpProcessor(tmp_path, handlers=["expensive"])
    proc = DataProcessor([expensive], collate_fn=None, dump_processor=dump,
                         handler_params={"expensive": {}})
    s = DataSample(file_path="x.wav")
    batch = proc.process([s])
    assert isinstance(batch, Batch) and batch.size == 1
    assert batch.data_samples[0].label == "computed"
    assert calls["n"] == 1
    # second pass: cache hit, handler not re-run
    batch2 = proc.process([DataSample(file_path="x.wav")])
    assert calls["n"] == 1
    assert batch2.data_samples[0].label == "computed"


def test_data_processor_skips_corrupted():
    @PipeRegistry.registry()
    def boom(ds):
        if ds.index == 1:
            raise RuntimeError("bad sample")
        return ds

    proc = DataProcessor([boom])
    batch = proc.process([DataSample(index=0), DataSample(index=1), DataSample(index=2)])
    assert batch.size == 2


# ------------------------------------------------------------------ samplers


def test_simple_sampler_epoch():
    ds = Dataset([DataSample(index=i, label=str(i)) for i in range(10)])
    s = SimpleSampler().set_dataset(ds)
    seen, last_flags = [], []
    for _ in range(6):
        batch, is_last = s.sampling(4)
        seen.extend(x.index for x in batch)
        last_flags.append(is_last)
    assert last_flags == [False, False, True, False, False, True]
    assert set(seen[:10]) == set(range(10))


def test_random_sampler_shuffles():
    ds = Dataset([DataSample(index=i) for i in range(32)])
    s = RandomSampler(seed=1).set_dataset(ds)
    first, _ = s.sampling(32)
    order1 = [x.index for x in first]
    assert order1 != list(range(32))
    assert sorted(order1) == list(range(32))


def test_weighted_sampler_balances():
    # 90 samples of speaker A, 10 of speaker B -> inverse-freq draws ~50/50
    samples = [DataSample(index=i, label="A" if i < 90 else "B") for i in range(100)]
    for s in samples:
        s.speaker_name = s.label
    ds = Dataset(samples)
    ws = WeightedSampler(fields=["speaker_name"], epoch_size=2000, seed=0).set_dataset(ds)
    counts = {"A": 0, "B": 0}
    drawn = 0
    while drawn < 2000:
        batch, _ = ws.sampling(50)
        for x in batch:
            counts[x.speaker_name] += 1
        drawn += 50
    frac_b = counts["B"] / (counts["A"] + counts["B"])
    assert 0.4 < frac_b < 0.6, counts


# ------------------------------------------------------------------ end-to-end pipeline


@pytest.fixture(scope="module")
def pipeline(mini_dataset_path_module):
    dp = DataPipeline.init_from_config(CFG_PATH, value_select=["debug"])
    dp.cfg.set_path("dirs.data_root", mini_dataset_path_module)
    return dp.init_components()


@pytest.fixture(scope="module")
def mini_dataset_path_module():
    import os

    p = f"{MINI_SEGS}"
    if not os.path.isdir(p):
        pytest.skip("reference mini dataset not available")
    return p


def test_pipeline_builds(pipeline):
    assert pipeline.alphabet is not None and len(pipeline.alphabet) > 10
    assert len(pipeline["train"].dataset) > 0
    info = pipeline.get_info()
    assert "SpeakerIDSetter" in info["singletons"]
    assert info["alphabet"]["symbols"][0] == "<PAD>"


@pytest.mark.slow
def test_pipeline_batch(pipeline):
    comp = pipeline["train"]
    batch = comp.sample_batch(2)
    assert batch is not None and batch.size >= 1
    c = batch.collated_samples
    assert c.mel is not None and c.mel.ndim == 3
    assert c.mel.shape[1] % 64 == 0  # frame bucketing
    assert c.transcription.shape[1] % 16 == 0  # token bucketing
    assert c.durations is not None
    # durations sum to true mel length per sample
    for i in range(batch.size):
        assert c.durations[i].sum() == c.mel_lengths[i]
    assert c.speaker_id.min() >= 0
    assert c.gate is not None and c.gate.max() == 1.0
    assert c.pitch is not None and c.energy is not None


def test_pipeline_info_roundtrip(pipeline):
    info = pipeline.get_info()
    comp = pipeline["train"]
    ds = comp.dataset
    dp2 = DataPipeline.from_info(info, datasets={"train": ds, "test": pipeline["test"].dataset})
    assert len(dp2.alphabet) == len(pipeline.alphabet)
    batch = dp2["train"].sample_batch(2)
    assert batch is not None and batch.collated_samples.mel is not None


def test_pipeline_eval_surgery(pipeline):
    # drop the audio-dependent handlers: text-only pipeline for inference
    dp = DataPipeline.from_info(
        pipeline.get_info(),
        ignored_handlers={
            "load_audio", "volume_normalize", "multiple_audio", "magnitude",
            "linear_to_mel", "amp_to_db", "normalize_mel", "energy", "pitch",
            "calc_durations", "aggregate_pitch", "aggregate_energy", "gate_target",
        },
    )
    comp = dp["train"]
    from speechflow_tpu.data.core.datasample import TTSDataSample

    s = TTSDataSample(phonemes=["h", "e", "l", "o"])
    batch = comp.datasample_to_batch([s])
    c = batch.collated_samples
    assert c.transcription is not None and c.mel is None


def test_simple_sampler_tokens_per_batch():
    """Dynamic batching by total length (reference: simple_sampler.py:21
    use_dynamic_batch): short items pack into bigger batches, long items get
    small batches, every batch respects the token budget."""
    ds = Dataset([DataSample(index=i) for i in range(12)])
    lengths = [10, 10, 10, 10, 100, 100, 200, 10, 10, 10, 10, 10]
    for i, n in enumerate(lengths):
        ds.item(i).length = n
    s = SimpleSampler(tokens_per_batch=120).set_dataset(ds)
    # sampler.reset() may have been called by set_dataset; re-apply lengths
    for i, n in enumerate(lengths):
        ds.item(i).length = n
    batches = []
    for _ in range(20):
        batch, is_last = s.sampling(batch_size=8)
        batches.append([x.index for x in batch])
        if is_last:
            break
    got = [i for b in batches for i in b]
    assert got == list(range(12))  # full epoch, in order, nothing dropped
    for b in batches:
        assert sum(lengths[i] for i in b) <= 120 or len(b) == 1
    # the four leading 10-length items packed together; the 200 item is alone
    assert batches[0] == [0, 1, 2, 3]
    assert [6] in batches


def test_fade_invert_frame_transcription_processors():
    """Round-2 TTS processor tail (reference: tts_processors.py:454 fade,
    :578 invert durations, :867 transcription_by_frames)."""
    from speechflow_tpu.data.core.datasample import TTSDataSample
    from speechflow_tpu.data.processors import get_handler
    from speechflow_tpu.data.processors.text import SIL
    from speechflow_tpu.io import AudioChunk, Timestamps

    sr = 24000
    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.5, 0.5, sr).astype(np.float32)
    phonemes = ["a", SIL, "b"]
    ts = Timestamps(np.asarray([[0.0, 0.3], [0.3, 0.7], [0.7, 1.0]]))
    ds = TTSDataSample(audio_chunk=AudioChunk(data=wav.copy(), sr=sr),
                       phonemes=phonemes, phoneme_timestamps=ts)

    out = get_handler("apply_fade_inside_pauses")(ds)
    w = out.audio_chunk.waveform
    mid = int(0.5 * sr)  # center of the pause: fully attenuated
    assert np.abs(w[mid - 200 : mid + 200]).max() < 0.02
    # speech regions untouched
    np.testing.assert_array_equal(w[: int(0.29 * sr)], wav[: int(0.29 * sr)])

    # invert durations + frame-level transcription
    ds2 = TTSDataSample(transcription=np.asarray([5, 6, 7], np.int64),
                        durations=np.asarray([2, 0, 3], np.float32))
    ds2 = get_handler("calc_invert_durations")(ds2)
    np.testing.assert_allclose(ds2.additional["invert_durations"],
                               [0.5, 0.5, 1 / 3, 1 / 3, 1 / 3], rtol=1e-6)
    ds2 = get_handler("transcription_by_frames")(ds2)
    np.testing.assert_array_equal(ds2.additional["transcription_by_frames"],
                                  [5, 5, 7, 7, 7])


def test_singleton_seed_keeps_speaker_ids_stable():
    """Resume/finetune singleton seeding (reference:
    SpeakerIDSetter.resume_from_checkpoint, config_prepare.py:241-268): the
    checkpoint's speaker/lang ids survive a refit on new data; new speakers
    append instead of permuting the embedding-table assignment."""
    from speechflow_tpu.data.core.components import DataPipeline

    def make_ds(speakers):
        samples = []
        for i, spk in enumerate(speakers):
            s = TTSDataSample(index=i)
            s.speaker_name = spk
            s.lang = "EN"
            samples.append(s)
        return Dataset(samples)

    from speechflow_tpu.data.core.datasample import TTSDataSample

    cfg = Config({"dataset": {"subsets": ["train"]},
                  "singleton_handlers": ["SpeakerIDSetter"],
                  "preproc": {"pipe": []}})
    dp1 = DataPipeline(cfg)
    dp1.init_components(datasets={"train": make_ds(["zeta", "alpha", "mid"])})
    state1 = dp1["train"].singletons["SpeakerIDSetter"].state_dict()
    ids1 = dict(state1["speaker2id"])
    assert set(ids1) == {"zeta", "alpha", "mid"}

    # new corpus: one speaker gone, one new, names that would sort earlier
    dp2 = DataPipeline(Config(cfg))
    dp2.init_components(datasets={"train": make_ds(["alpha", "aaa_new", "zeta"])},
                        seed_singletons={"SpeakerIDSetter": state1})
    ids2 = dp2["train"].singletons["SpeakerIDSetter"].state_dict()["speaker2id"]
    # old ids unchanged (no permutation), new speaker appended at the end
    for k, v in ids1.items():
        assert ids2[k] == v, (k, ids1, ids2)
    assert ids2["aaa_new"] == len(ids1)

    # unseeded refit WOULD permute (sanity check that the test is meaningful)
    dp3 = DataPipeline(Config(cfg))
    dp3.init_components(datasets={"train": make_ds(["alpha", "aaa_new", "zeta"])})
    ids3 = dp3["train"].singletons["SpeakerIDSetter"].state_dict()["speaker2id"]
    assert ids3 != {k: ids2[k] for k in ids3}

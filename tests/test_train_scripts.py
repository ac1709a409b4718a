"""Debug-config end-to-end smoke runs — the reference test strategy's
"full train loop on the committed mini dataset" pattern (SURVEY §4):
each CLI trains a few steps through the real data plane, writes a checkpoint,
and the eval interfaces rebuild everything from that checkpoint alone."""

import os
from pathlib import Path

import numpy as np
import pytest

CFG = Path(__file__).parent.parent / "configs"
MINI = "/root/reference/examples/simple_datasets/speech/SEGS"

pytestmark = pytest.mark.skipif(not os.path.isdir(MINI),
                                reason="reference mini dataset unavailable")


@pytest.fixture(scope="module")
def tts_experiment(tmp_path_factory):
    from speechflow_tpu.scripts import train_tts

    out = tmp_path_factory.mktemp("tts_exp")
    argv = ["-c", str(CFG / "tts_model.yml"), "-cd", str(CFG / "tts_data_24khz.yml"),
            "-vs", "debug", "--data_root", MINI]
    import speechflow_tpu.scripts.common as common
    # redirect experiment dir into tmp
    orig = common.config_prepare

    def patched(args):
        m, d, s = orig(args)
        return m, d, s

    model_cfg_path = CFG / "tts_model.yml"
    import speechflow_tpu.io as io

    cfg = io.Config.create_from_file(model_cfg_path, value_select=["debug"])
    cfg.set_path("experiment.base_dir", str(out))
    patched_cfg = out / "tts_model.yml"
    cfg.to_file(patched_cfg)
    argv[1] = str(patched_cfg)
    exp_path = train_tts.main(argv)
    return Path(exp_path)


def test_tts_train_and_eval_interface(tts_experiment):
    from speechflow_tpu.interface import TTSEvaluationInterface, TTSOptions
    from speechflow_tpu.training import ExperimentSaver

    ckpt = ExperimentSaver.get_last_checkpoint(tts_experiment)
    assert ckpt is not None
    iface = TTSEvaluationInterface(ckpt)
    assert "EN" in iface.get_languages() or iface.get_languages() == []
    assert len(iface.get_speakers()) >= 1
    out = iface.synthesize("Hello world. This is a test!",
                           lang="EN", speaker=iface.get_speakers()[0],
                           opts=TTSOptions(t_out=128))
    mel = np.asarray(out.after_postnet_spectrogram)
    assert mel.ndim == 3 and mel.shape[2] == 80  # debug n_mels
    assert np.isfinite(mel).all()
    assert mel.shape[0] == 2  # two sentences


def test_vocoder_train_and_eval_interface(tmp_path):
    from speechflow_tpu.io import Config
    from speechflow_tpu.scripts import train_vocoder
    from speechflow_tpu.interface import VocoderEvaluationInterface
    from speechflow_tpu.training import ExperimentSaver

    cfg = Config.create_from_file(CFG / "vocoder_model.yml", value_select=["debug"])
    cfg.set_path("experiment.base_dir", str(tmp_path))
    mpath = tmp_path / "vocoder_model.yml"
    cfg.to_file(mpath)
    exp = train_vocoder.main(["-c", str(mpath), "-cd", str(CFG / "vocoder_data_24khz.yml"),
                              "-vs", "debug", "--data_root", MINI])
    ckpt = ExperimentSaver.get_last_checkpoint(exp)
    iface = VocoderEvaluationInterface(ckpt)
    mel = np.random.default_rng(0).normal(size=(33, 80)).astype(np.float32)
    audio = iface.synthesize(mel)
    assert audio.sr == 24000
    assert len(audio) == 32 * 256
    # copy synthesis
    from speechflow_tpu.io import AudioChunk

    wav = AudioChunk(data=np.random.default_rng(1).uniform(-0.3, 0.3, 24000).astype(np.float32), sr=24000)
    out = iface.resynthesize(wav)
    assert len(out) > 20000


def test_aligner_train_script(tmp_path):
    from speechflow_tpu.io import Config
    from speechflow_tpu.scripts import train_aligner
    from speechflow_tpu.training import ExperimentSaver

    cfg = Config.create_from_file(CFG / "aligner_model.yml", value_select=["debug"])
    cfg.set_path("experiment.base_dir", str(tmp_path))
    mpath = tmp_path / "aligner_model.yml"
    cfg.to_file(mpath)
    exp = train_aligner.main(["-c", str(mpath), "-cd", str(CFG / "tts_data_24khz.yml"),
                              "-vs", "debug", "--data_root", MINI])
    assert ExperimentSaver.get_last_checkpoint(exp) is not None

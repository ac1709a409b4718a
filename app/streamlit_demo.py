"""Streamlit TTS demo (reference: app/streamlit/tts_demo.py:46).

Run where streamlit is installed:
  streamlit run app/streamlit_demo.py -- --tts_ckpt <dir> --vocoder_ckpt <dir>
(The stdlib equivalent, app/demo_server.py, has no extra dependencies.)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import numpy as np
    import streamlit as st

    from speechflow_tpu.interface import (
        TTSEvaluationInterface,
        TTSOptions,
        VocoderEvaluationInterface,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--tts_ckpt", required=True)
    parser.add_argument("--vocoder_ckpt", required=True)
    args = parser.parse_args()

    @st.cache_resource
    def load():
        return (TTSEvaluationInterface(args.tts_ckpt),
                VocoderEvaluationInterface(args.vocoder_ckpt))

    tts, voc = load()
    st.title("speechflow-tpu — TTS demo")
    lang = st.selectbox("Language", tts.get_languages() or ["EN"])
    speaker = st.selectbox("Speaker", tts.get_speakers() or ["default"])
    text = st.text_area("Text", "Hello world. This is the TPU-native speech framework!")
    if st.button("Synthesize"):
        out = tts.synthesize(text, lang=lang, speaker=speaker, opts=TTSOptions(t_out=512))
        mels = out.after_postnet_spectrogram
        lens = np.asarray(out.spectrogram_lengths)
        wav = np.concatenate([
            voc.synthesize(np.asarray(mels[i][: int(lens[i])])).waveform
            for i in range(mels.shape[0])
        ])
        st.audio(wav, sample_rate=voc.sample_rate)


if __name__ == "__main__":
    main()

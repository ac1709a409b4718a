"""Absolute paths to the vendored test corpora.

The mini speech corpus (LJSpeech/VCTK/Natasha/Ruslan snippets with
.TextGridStage{1,2,3} alignments and .whisper transcripts) is vendored under
``tests/data/`` so the suite is self-contained — it mirrors the reference's
committed ``examples/simple_datasets/speech`` test data
(reference README.md:61 documents ``pytest tests`` as install verification
against exactly this corpus). LJSpeech/VCTK source audio is public-domain /
CC-licensed test data, not framework code.
"""

import os

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))

# Praat TextGrid segmentations (the annotated corpus all pipeline tests read).
MINI_SEGS = os.path.join(TESTS_DIR, "data", "SEGS")

# Raw source tree (wav + metadata.csv + committed .whisper transcripts) used
# by the annotator tests (seg generation from ASR output).
SRC_ROOT = os.path.join(TESTS_DIR, "data", "SRC")
SRC_WAVS = os.path.join(
    SRC_ROOT, "EN", "OPENSOURCE_VOICES", "001_LJSpeech", "LJSpeech-1.1", "wavs")

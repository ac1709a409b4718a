"""Regenerate the committed ogg/opus fixtures from a reference corpus wav.

Run from the repo root:  python tests/tools/make_ogg_fixtures.py
The committed fixtures let the decode tests run independently of the encoder
(libvorbisfile/libopus decode files produced earlier, not in-process buffers).
"""

from pathlib import Path

from speechflow_tpu.io import AudioChunk
from tests.paths import MINI_SEGS

SRC = Path(f"{MINI_SEGS}")
OUT = Path(__file__).parent.parent / "data"


def main() -> None:
    wav = sorted(SRC.rglob("*.wav"))[0]
    chunk = AudioChunk(file_path=wav, end=2.0).load()
    chunk.save(OUT / "fixture.ogg", overwrite=True)
    chunk.save(OUT / "fixture.opus", overwrite=True)
    (OUT / "fixture_meta.txt").write_text(
        f"source={wav}\nsr={chunk.sr}\nseconds=2.0\n")
    print("wrote", OUT / "fixture.ogg", OUT / "fixture.opus")


if __name__ == "__main__":
    main()

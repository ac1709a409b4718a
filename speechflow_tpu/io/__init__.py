from speechflow_tpu.io.config import Config, yaml_load, yaml_dump, change_config_file
from speechflow_tpu.io.audio import AudioChunk, AudioFormat
from speechflow_tpu.io.timestamps import Timestamps
from speechflow_tpu.io.seg import AudioSeg, Tier, TextGrid
from speechflow_tpu.io.flist import generate_file_list, read_file_list, construct_file_list, split_file_list
from speechflow_tpu.io.serialize import Serialize

__all__ = [
    "Config", "yaml_load", "yaml_dump", "change_config_file",
    "AudioChunk", "AudioFormat",
    "Timestamps",
    "AudioSeg", "Tier", "TextGrid",
    "generate_file_list", "read_file_list", "construct_file_list", "split_file_list",
    "Serialize",
]

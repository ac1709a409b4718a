"""Binary serialization for inter-process transport and caches.

Capability parity with the reference ``Serialize`` (speechflow/utils/serialize.py:21):
pickle round-trip of samples/batches with list framing, used by the ZMQ data
plane and the feature-dump cache. numpy arrays dominate payloads, so we use
pickle protocol 5 (out-of-band-capable, zero-copy friendly).
"""

from __future__ import annotations

import pickle
import typing as tp

__all__ = ["Serialize"]


class Serialize:
    PROTOCOL = 5

    @staticmethod
    def dump(obj: tp.Any) -> bytes:
        return pickle.dumps(obj, protocol=Serialize.PROTOCOL)

    @staticmethod
    def load(blob: bytes) -> tp.Any:
        return pickle.loads(blob)

    @staticmethod
    def dumps(objs: tp.Sequence[tp.Any]) -> tp.List[bytes]:
        return [Serialize.dump(o) for o in objs]

    @staticmethod
    def loads(blobs: tp.Sequence[bytes]) -> tp.List[tp.Any]:
        return [Serialize.load(b) for b in blobs]

    @staticmethod
    def size(obj: tp.Any) -> int:
        return len(Serialize.dump(obj))

"""Standalone DataClient.

Capability parity with the reference DataClient
(speechflow/data_server/client.py:15): connect to a running DataServer,
fetch its pipeline info once, and query it by dotted-key search (find_info /
find_section) without pulling batches. The loaders fold this handshake into
their own startup (server/loader.py:75); this class is for tooling and eval
interfaces that only need the metadata."""

from __future__ import annotations

import pickle
import typing as tp
import uuid

import zmq

from speechflow_tpu.io.serialize import Serialize

__all__ = ["DataClient", "flatten_dict"]


def flatten_dict(d: tp.Mapping, parent: str = "", sep: str = ".") -> tp.Dict[str, tp.Any]:
    out: tp.Dict[str, tp.Any] = {}
    for k, v in d.items():
        key = f"{parent}{sep}{k}" if parent else str(k)
        if isinstance(v, tp.Mapping) and v:
            out.update(flatten_dict(v, key, sep))
        else:
            out[key] = v
    return out


class DataClient:
    def __init__(self, server_addr: str, timeout_s: float = 60.0):
        self.uid = uuid.uuid4().hex[:12]
        self.server_addr = server_addr
        ctx = zmq.Context.instance()
        self._socket = ctx.socket(zmq.DEALER)
        self._socket.setsockopt(zmq.IDENTITY, f"client-{self.uid}".encode())
        self._socket.setsockopt(zmq.LINGER, 500)
        self._socket.connect(server_addr)
        self._socket.send(pickle.dumps({"type": "info"}))
        if not self._socket.poll(int(timeout_s * 1000)):
            raise TimeoutError(f"data server at {server_addr} did not answer info")
        reply = pickle.loads(self._socket.recv())
        self.info: tp.Dict[str, tp.Any] = Serialize.load(reply["blob"])
        self.n_workers = reply.get("n_workers", 1)

    def close(self) -> None:
        try:
            self._socket.close()
        except Exception:  # noqa: BLE001
            pass

    def __enter__(self) -> "DataClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- queries (reference client.py:49 find_info / :66 find_section) --------

    def find_info(self, name: str, default: tp.Any = None,
                  section: tp.Optional[str] = None) -> tp.Any:
        """First non-empty value whose dotted key ends with ``name``."""
        src = self.info if section is None else self.info.get(section, {})
        for key, field in flatten_dict(src).items():
            if key.endswith(name) and field not in (None, {}):
                return field
        return default

    def find_section(self, name_or_value: str, default: tp.Any = None) -> tp.Any:
        """Subtree named ``name_or_value`` anywhere in the info tree, or the
        subtree containing it as a value."""
        if name_or_value in self.info:
            return self.info[name_or_value]
        path: tp.Optional[tp.List[str]] = None
        for key, field in flatten_dict(self.info).items():
            parts = key.split(".")
            if name_or_value in parts:
                path = parts[: parts.index(name_or_value) + 1]
            elif isinstance(field, str) and field == name_or_value:
                path = parts[:-1]
        if not path:
            return default
        node: tp.Any = self.info
        for name in path:
            if not isinstance(node, tp.Mapping) or name not in node:
                return default
            node = node[name]
        return node

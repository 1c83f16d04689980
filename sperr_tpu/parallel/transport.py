"""Host-side byte transport for multi-process runs (the data plane).

Compressed payloads are host bytes, not device arrays — shipping them
through device collectives (all-gather padded to the global max) makes
every host receive nprocs * max_payload bytes.  The reference's pattern is
an ordered gather to rank 0 (SPERR3D_OMP_C.cpp:145-161): only the root
receives, and only actual bytes travel.  This module provides that as a
pluggable transport:

  * ``SocketGatherTransport`` — plain TCP gather-to-0 over the hosts'
    DCN/management network: rank 0 listens, every other rank connects and
    streams ``{pid u32, len u64, payload}``.  No padding, no broadcast;
    total traffic = sum(len).  The root address comes from the constructor
    or ``SPERR_TPU_GATHER_ADDR`` (host:port).
  * ``AllgatherTransport`` — fallback riding jax.distributed's
    process_allgather (works wherever JAX multihost works, but over-ships:
    every host receives everything, padded).
  * ``LocalTransport`` — single-process identity.

``gather_bytes(payload, pid, nprocs)`` returns the ordered list of payloads
on rank 0 and None elsewhere.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
from typing import List, Optional

_HDR = struct.Struct("<IQ")  # pid u32, payload length u64


def _recv_exact(conn: socket.socket, ln: int) -> bytes:
    parts = []
    got = 0
    while got < ln:
        b = conn.recv(min(1 << 20, ln - got))
        if not b:
            raise ConnectionError("gather sender closed early")
        parts.append(b)
        got += len(b)
    return b"".join(parts)


class LocalTransport:
    def gather_bytes(self, payload: bytes, pid: int, nprocs: int):
        assert nprocs == 1
        return [payload]


class AllgatherTransport:
    """Max-padded uint8 all-gather via jax.distributed (fallback path)."""

    def gather_bytes(self, payload: bytes, pid: int, nprocs: int):
        if nprocs == 1:
            return [payload]
        import numpy as np
        from jax.experimental import multihost_utils

        lengths = multihost_utils.process_allgather(
            np.array([len(payload)], dtype=np.int64)
        ).reshape(-1)
        maxlen = int(lengths.max())
        buf = np.zeros(maxlen, dtype=np.uint8)
        buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
        gathered = np.asarray(
            multihost_utils.process_allgather(buf)
        ).reshape(nprocs, maxlen)
        out = [gathered[p, : int(lengths[p])].tobytes() for p in range(nprocs)]
        return out if pid == 0 else None


class SocketGatherTransport:
    """Ordered TCP gather to rank 0: the reference's serial gather point,
    across hosts.  Root binds ``addr`` before (or as) senders connect;
    senders retry the connect until the listener is up (bounded by
    ``timeout``)."""

    def __init__(self, addr: Optional[str] = None, timeout: float = 120.0):
        addr = addr or os.environ.get("SPERR_TPU_GATHER_ADDR")
        if not addr:
            raise ValueError(
                "SocketGatherTransport needs host:port (arg or "
                "SPERR_TPU_GATHER_ADDR)"
            )
        host, port = addr.rsplit(":", 1)
        self.host, self.port = host, int(port)
        self.timeout = timeout

    def gather_bytes(self, payload: bytes, pid: int, nprocs: int):
        if nprocs == 1:
            return [payload]
        if pid == 0:
            return self._root(payload, nprocs)
        self._send(payload, pid)
        return None

    def _root(self, own: bytes, nprocs: int) -> List[bytes]:
        out: List[Optional[bytes]] = [None] * nprocs
        out[0] = own
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.host, self.port))
        srv.listen(nprocs)
        srv.settimeout(self.timeout)
        try:
            # each peer connection is drained on its own thread so a slow
            # sender doesn't serialize the gather
            def drain(conn):
                with conn:
                    hdr = _recv_exact(conn, _HDR.size)
                    spid, ln = _HDR.unpack(hdr)
                    out[spid] = _recv_exact(conn, ln)

            threads = []
            for _ in range(nprocs - 1):
                conn, _ = srv.accept()
                t = threading.Thread(target=drain, args=(conn,))
                t.start()
                threads.append(t)
            for t in threads:
                t.join(self.timeout)
        finally:
            srv.close()
        missing = [p for p, b in enumerate(out) if b is None]
        if missing:
            raise ConnectionError(f"gather missing payloads from ranks {missing}")
        return out  # type: ignore[return-value]

    def _send(self, payload: bytes, pid: int) -> None:
        import time

        deadline = time.monotonic() + self.timeout
        while True:
            try:
                conn = socket.create_connection(
                    (self.host, self.port), timeout=self.timeout
                )
                break
            except OSError:
                if time.monotonic() > deadline:
                    raise
                time.sleep(0.05)
        with conn:
            conn.sendall(_HDR.pack(pid, len(payload)))
            conn.sendall(payload)


def default_transport(nprocs: int):
    if nprocs == 1:
        return LocalTransport()
    if os.environ.get("SPERR_TPU_GATHER_ADDR"):
        return SocketGatherTransport()
    return AllgatherTransport()

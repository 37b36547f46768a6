"""The binary serving wire format: ``.npy`` bodies over HTTP.

numpy-only module (no jax import) shared by the server, the client, the
latency benchmark, and the tests — a client process must not need a jax
install to talk to the server. JSON tensor bodies dominate the wire
latency at 128px (measured — benchmarks/RESULTS.md "Binary wire
format"), so tensor-carrying endpoints speak ``.npy`` when the request
is ``Content-Type: application/x-npy`` (or ``application/octet-stream``)
or asks via ``Accept: application/x-npy``.
"""

from __future__ import annotations

import io

import numpy as np

NPY_CONTENT_TYPE = "application/x-npy"
BINARY_CONTENT_TYPES = (NPY_CONTENT_TYPE, "application/octet-stream")


def npy_dumps(arr: np.ndarray) -> bytes:
    """Serialize an array to ``.npy`` bytes (the binary wire format)."""
    buf = io.BytesIO()
    np.lib.format.write_array(buf, np.ascontiguousarray(arr), allow_pickle=False)
    return buf.getvalue()


def npy_loads(body: bytes) -> np.ndarray:
    """Parse ``.npy`` bytes. ``allow_pickle=False``: untrusted request
    bodies must never deserialize arbitrary objects."""
    return np.lib.format.read_array(io.BytesIO(body), allow_pickle=False)

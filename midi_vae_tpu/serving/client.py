"""Python client for the inference server (`midi_vae_tpu.serving.server`).

Zero-dependency (stdlib ``urllib`` + numpy) wrapper over the HTTP API.
Tensor-carrying calls use the **binary npy wire** by default
(``Content-Type``/``Accept: application/x-npy`` — measured ~9× the JSON
wire throughput at 128px, benchmarks/RESULTS.md "Binary wire format");
``wire="json"`` selects the human-readable path for debugging. Server
errors raise :class:`ServingError` carrying the HTTP status and the
server's JSON error message (errors are always JSON, both wires).

    from midi_vae_tpu.serving.client import ServingClient
    c = ServingClient("http://127.0.0.1:8000")
    recon = c.reconstruct(x)            # [N,H,W,C] float32 → [N,H,W,C]
    mu, log_var = c.encode(x)           # → ([N,D], [N,D])
    rolls = c.sample(n=16, seed=0)      # → [16,H,W,C]
    path = c.interpolate(a, b, steps=9) # → [9,H,W,C]
    cont = c.continue_rolls(x, keep_cols=4)  # two-stage continuation (--prior)

Conditional checkpoints (``--conditional`` runs) require labels on every
endpoint — pass ``labels=`` (scalar broadcasts; a list/array is
per-item). On the npy wire they ride the query string, on the JSON wire
the body, matching the server's contract.

The reference has no serving layer at all (SURVEY §1); this client
completes ours: server, batcher, wire format, and caller all in-tree.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Optional, Tuple

import numpy as np

from midi_vae_tpu.serving.wire import NPY_CONTENT_TYPE, npy_dumps, npy_loads


class ServingError(RuntimeError):
    """An HTTP error from the server, with its JSON error message."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


def _label_query(labels) -> str:
    """``labels`` → query-string suffix for the binary wire ('' when None)."""
    if labels is None:
        return ""
    arr = np.asarray(labels, np.int32)
    if arr.ndim == 0:
        return f"label={int(arr)}"
    return "labels=" + ",".join(str(int(v)) for v in arr)


def _label_fields(labels) -> dict:
    """``labels`` → JSON body fields for the JSON wire ({} when None)."""
    if labels is None:
        return {}
    arr = np.asarray(labels, np.int32)
    if arr.ndim == 0:
        return {"label": int(arr)}
    return {"labels": [int(v) for v in arr]}


class ServingClient:
    def __init__(self, base_url: str, *, wire: str = "npy", timeout: float = 120.0):
        if wire not in ("npy", "json"):
            raise ValueError(f"wire must be 'npy' or 'json', got {wire!r}")
        self.base_url = base_url.rstrip("/")
        self.wire = wire
        self.timeout = timeout

    # -- transport ---------------------------------------------------------
    def _request(self, path: str, data: Optional[bytes], headers: dict):
        req = urllib.request.Request(self.base_url + path, data=data, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                body = resp.read()
                ctype = resp.headers.get("Content-Type", "")
        except urllib.error.HTTPError as e:
            try:
                message = json.loads(e.read()).get("error", "")
            except Exception:  # noqa: BLE001 - any unparseable error body
                message = e.reason
            raise ServingError(e.code, message) from None
        if ctype == NPY_CONTENT_TYPE:
            return npy_loads(body)
        return json.loads(body)

    def _post_tensor(self, path: str, x: np.ndarray, labels=None):
        """POST a tensor body on the configured wire (labels: query/body)."""
        x = np.asarray(x, np.float32)
        if self.wire == "npy":
            q = _label_query(labels)
            return self._request(
                path + (f"?{q}" if q else ""), npy_dumps(x), {"Content-Type": NPY_CONTENT_TYPE}
            )
        return self._request(
            path,
            json.dumps({"images": x.tolist(), **_label_fields(labels)}).encode(),
            {"Content-Type": "application/json"},
        )

    def _post_params(self, path: str, params: dict):
        """POST JSON parameters; the response rides the configured wire."""
        headers = {"Content-Type": "application/json"}
        if self.wire == "npy":
            headers["Accept"] = NPY_CONTENT_TYPE
        return self._request(path, json.dumps(params).encode(), headers)

    # -- API ----------------------------------------------------------------
    def healthz(self) -> dict:
        return self._request("/healthz", None, {})

    def reconstruct(self, x: np.ndarray, labels=None) -> np.ndarray:
        """[N,H,W,C] (or [H,W,C]) in [0,1] → posterior-mean reconstructions."""
        out = self._post_tensor("/reconstruct", x, labels)
        return out if isinstance(out, np.ndarray) else np.asarray(out["reconstructions"], np.float32)

    def encode(self, x: np.ndarray, labels=None) -> Tuple[np.ndarray, np.ndarray]:
        """[N,H,W,C] → (mu [N,D], log_var [N,D])."""
        out = self._post_tensor("/encode", x, labels)
        if isinstance(out, np.ndarray):  # npy wire: [N, 2D] mu ‖ log_var halves
            d = out.shape[-1] // 2
            return out[:, :d], out[:, d:]
        return np.asarray(out["mu"], np.float32), np.asarray(out["log_var"], np.float32)

    def sample(self, n: int, seed: int = 0, labels=None, *,
               temperature: float = 1.0, top_p: Optional[float] = None) -> np.ndarray:
        """n prior draws. ``temperature``/``top_p`` apply to two-stage
        (code-prior-backed) deployments — the server rejects them otherwise."""
        params = {"n": int(n), "seed": int(seed), **_label_fields(labels)}
        if temperature != 1.0:
            params["temperature"] = float(temperature)
        if top_p is not None:
            params["top_p"] = float(top_p)
        out = self._post_params("/sample", params)
        return out if isinstance(out, np.ndarray) else np.asarray(out["samples"], np.float32)

    def continue_rolls(self, x: np.ndarray, keep_cols: int, *, seed: int = 0,
                       temperature: float = 1.0, top_p: Optional[float] = None,
                       labels=None) -> np.ndarray:
        """[N,H,W,C] rolls → same-shape continuations: the server keeps each
        roll's first ``keep_cols`` code-grid TIME columns and the attached
        code prior writes the rest (VQ checkpoints served with --prior)."""
        x = np.asarray(x, np.float32)
        if x.ndim == 3:
            x = x[None]
        if self.wire == "npy":
            path = (f"/continue?keep_cols={int(keep_cols)}&seed={int(seed)}"
                    f"&temperature={float(temperature)}")
            if top_p is not None:
                path += f"&top_p={float(top_p)}"
            q = _label_query(labels)
            if q:
                path += f"&{q}"
            return self._request(path, npy_dumps(x), {"Content-Type": NPY_CONTENT_TYPE})
        params = {
            "images": x.tolist(),
            "keep_cols": int(keep_cols),
            "seed": int(seed),
            "temperature": float(temperature),
            **({"top_p": float(top_p)} if top_p is not None else {}),
            **_label_fields(labels),
        }
        out = self._post_params("/continue", params)
        return out if isinstance(out, np.ndarray) else np.asarray(out["continuations"], np.float32)

    def interpolate(
        self, a: np.ndarray, b: np.ndarray, *, steps: int = 8, slerp: bool = False, labels=None
    ) -> np.ndarray:
        """[H,W,C] endpoints → [steps,H,W,C] latent-space path."""
        if self.wire == "npy":
            # one [2,H,W,C] npy body carries both endpoints; the scalar
            # parameters ride the query string
            ends = np.stack([np.asarray(a, np.float32), np.asarray(b, np.float32)])
            path = f"/interpolate?steps={int(steps)}&slerp={int(bool(slerp))}"
            q = _label_query(labels)
            if q:
                path += f"&{q}"
            return self._request(path, npy_dumps(ends), {"Content-Type": NPY_CONTENT_TYPE})
        params = {
            "a": np.asarray(a, np.float32).tolist(),
            "b": np.asarray(b, np.float32).tolist(),
            "steps": int(steps),
            "slerp": bool(slerp),
            **_label_fields(labels),
        }
        out = self._post_params("/interpolate", params)
        return out if isinstance(out, np.ndarray) else np.asarray(out["path"], np.float32)

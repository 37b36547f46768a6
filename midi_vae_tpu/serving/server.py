"""HTTP inference server over a trained checkpoint.

Minimal stdlib server (no extra dependencies) wrapping the
:class:`~midi_vae_tpu.serving.batcher.MicroBatcher`:

- ``POST /reconstruct`` — body ``{"images": [[...]]}`` (nested lists,
  [N,H,W,C] in [0,1]) → ``{"reconstructions": [...]}``
- ``POST /encode`` — same input → ``{"mu": [...], "log_var": [...]}``
- ``POST /sample`` — ``{"n": 4, "seed": 0}`` → ``{"samples": [...]}``
- ``POST /interpolate`` — ``{"a": [...], "b": [...], "steps": 8,
  "slerp": false}`` ([H,W,C] endpoints in [0,1]) → ``{"path": [...]}``
- ``GET /healthz`` — liveness + batcher stats

Run: ``python -m midi_vae_tpu.serving.server --checkpoint CKPT --port 8000``

Reconstruct/encode go through the micro-batcher (concurrent requests
coalesce into one device program); sampling runs direct (already
batched by ``n``).

**Two-stage sampling** (``--prior``): with a trained code prior
(``cli/train_prior.py``) attached to a VQ checkpoint, ``POST /sample``
draws code grids via the ``lax.scan`` ancestral sampler and decodes
them — the same math and key convention as ``generate --prior``. The
JSON body gains optional ``"temperature"`` (prior-backed sampling
only); a class-conditional prior makes ``"label"`` required. AOT
artifacts bake the sampler at export time (``aot_export --prior``).
``POST /continue`` (checkpoint-backed prior only) — body
``{"images": [...], "keep_cols": K, "seed", "temperature", "top_p"}``
(or an npy tensor body with those scalars on the query string) encodes
the rolls, keeps their first K code-grid time columns, and has the
prior write the rest: the served twin of ``generate --mode continue``.

**Conditional checkpoints** (``--conditional`` runs) require labels on
every endpoint: JSON ``"label"`` (scalar) / ``"labels"`` (one per image),
or ``?label=K`` / ``?labels=0,3,1`` on the query string for the binary
wire. Labels batch alongside the images, so mixed-class requests still
coalesce into one dispatch. ``GET /healthz`` reports ``conditional`` and
``num_classes``.

**Binary wire format** (production path): JSON tensor bodies dominate
the wire latency at 128px (measured — RESULTS.md "Serving latency"), so
``/reconstruct`` and ``/encode`` also accept a raw ``.npy`` body
(``Content-Type: application/x-npy`` or ``application/octet-stream``,
float32 [N,H,W,C] or [H,W,C]) and every endpoint returns ``.npy``
(``Content-Type: application/x-npy``) when the request is binary or
sends ``Accept: application/x-npy``. The npy ``/encode`` response is one
[N, 2·latent_dim] array — ``mu ‖ log_var`` halves. npy parsing uses
``allow_pickle=False`` (no object arrays from untrusted bytes). Errors
are always JSON.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from midi_vae_tpu.serving.batcher import MicroBatcher
from midi_vae_tpu.serving.wire import (  # noqa: F401 - re-exported for callers
    BINARY_CONTENT_TYPES as _BINARY_CONTENT_TYPES,
)
from midi_vae_tpu.serving.wire import NPY_CONTENT_TYPE, npy_dumps, npy_loads


class InferenceService:
    """Jitted model entry points + batchers, built from a checkpoint.

    ``benchmarks/serving_latency.py`` constructs this same class (via
    :meth:`from_parts`) and times ``service.reconstruct`` — the handler
    and the benchmark execute one code path.
    """

    def __init__(self, checkpoint_path: str, *, max_batch: int = 64, max_wait_ms: float = 2.0,
                 prior_path: Optional[str] = None):
        from midi_vae_tpu.cli.generate import _load_model_and_state

        (model, params, batch_stats, config,
         image_size, channels, dataset) = _load_model_and_state(checkpoint_path)
        self._init_from_parts(
            model, params, batch_stats, image_size, channels,
            config=config, dataset=dataset, max_batch=max_batch, max_wait_ms=max_wait_ms,
        )
        if prior_path is not None:
            self.attach_prior(prior_path)

    @classmethod
    def from_parts(
        cls, model, params, batch_stats, image_size: int, channels: int = 1,
        *, max_batch: int = 64, max_wait_ms: float = 2.0,
    ) -> "InferenceService":
        """Build a service from in-memory model state (no checkpoint file)."""
        self = cls.__new__(cls)
        self._init_from_parts(
            model, params, batch_stats, image_size, channels,
            max_batch=max_batch, max_wait_ms=max_wait_ms,
        )
        return self

    @classmethod
    def from_artifact(
        cls, artifact_dir: str, *, max_batch: int = 64, max_wait_ms: float = 2.0,
    ) -> "InferenceService":
        """Serve an AOT-exported artifact directory (interop/aot_export.py).

        The deployment path that needs NO model code or checkpoint: the
        StableHLO programs (weights baked in) back every endpoint —
        reconstruct/encode through the micro-batcher, /sample composed
        from host-drawn z through the exported decode, /interpolate from
        the exported encode + decode.
        """
        from midi_vae_tpu.interop.aot_export import AOTServingBundle

        bundle = AOTServingBundle(artifact_dir)
        m = bundle.manifest
        self = cls.__new__(cls)
        self.model, self.params, self.batch_stats = None, None, None
        self._prior = None
        # artifacts exported with --prior carry the two-stage sampler program
        self.prior_info = m.get("prior")
        self.model_name = f"{m.get('model', 'unknown')} (AOT artifact)"
        self.config, self.dataset = {}, None
        self.image_size, self.channels = int(m["image_size"]), int(m["channels"])
        self.latent_dim = int(m["latent_dim"])
        self.latent_kind = m.get("latent_kind", "gaussian")
        self.num_classes = bundle.num_classes
        self.conditional = bundle.conditional
        self._bundle = bundle

        # labeled batchers call fn(rows, labels); unconditional artifacts
        # take a single positional argument — same contract as the jitted
        # checkpoint path
        item_shape = (self.image_size, self.image_size, self.channels)
        self.reconstruct = MicroBatcher(
            bundle.reconstruct, max_batch=max_batch, max_wait_ms=max_wait_ms,
            item_shape=item_shape, labeled=self.conditional,
        )
        self.encode = MicroBatcher(
            bundle.encode, max_batch=max_batch, max_wait_ms=max_wait_ms,
            item_shape=item_shape, labeled=self.conditional,
        )
        return self

    def _init_from_parts(
        self, model, params, batch_stats, image_size, channels,
        *, config=None, dataset=None, max_batch=64, max_wait_ms=2.0,
    ):
        self.model, self.params, self.batch_stats = model, params, batch_stats
        self.model_name = type(model).__name__
        self._bundle = None  # set by from_artifact (AOT-exported serving)
        self._prior = None  # set by attach_prior (two-stage VQ sampling)
        self.prior_info = None
        self.config, self.dataset = config or {}, dataset
        self.image_size, self.channels = image_size, channels
        # Conditional checkpoints (--conditional runs): every endpoint takes
        # labels — batched alongside the images, so mixed-class requests
        # still coalesce into one device dispatch.
        self.num_classes = int(getattr(model, "num_classes", 0) or 0)
        self.conditional = self.num_classes > 0

        from midi_vae_tpu.models.vae import label_kwarg

        @jax.jit
        def _reconstruct(x, y=None):
            # Posterior-MEAN decode: encode → mu → decode, no reparam draw.
            # This is the right serving semantics (the mean is the MAP
            # reconstruction; a fixed-key eps draw would add the same frozen
            # noise to every request) and it is exactly the computation
            # benchmarks/serving_latency.py measures — the served path and
            # the benched path are one code path.
            yk = label_kwarg(y)
            enc = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False,
                method=type(model).encode, **yk,
            )
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, enc.mu, train=False,
                method=type(model).decode, **yk,
            )

        @jax.jit
        def _encode(x, y=None):
            enc = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False,
                method=type(model).encode, **label_kwarg(y),
            )
            return jnp.concatenate([enc.mu, enc.log_var], axis=-1)

        item_shape = (self.image_size, self.image_size, self.channels)
        self.reconstruct = MicroBatcher(
            _reconstruct, max_batch=max_batch, max_wait_ms=max_wait_ms, item_shape=item_shape,
            labeled=self.conditional,
        )
        self.encode = MicroBatcher(
            _encode, max_batch=max_batch, max_wait_ms=max_wait_ms, item_shape=item_shape,
            labeled=self.conditional,
        )
        # the dim of the vectors crossing the encode/decode wire: for VQ
        # models that's the flattened [s·s·D] latent grid, not the per-code D
        self.latent_dim = int(getattr(self.model, "flat_latent_dim", self.model.latent_dim))
        self.latent_kind = getattr(self.model, "latent_kind", "gaussian")

    MAX_SAMPLES = 1024  # same bound rationale as MAX_INTERPOLATE_STEPS

    def attach_prior(self, prior_path: str) -> None:
        """Load a trained code prior (``cli/train_prior.py``) next to a VQ
        checkpoint: ``/sample`` then draws codes via the ``lax.scan``
        ancestral sampler instead of the i.i.d. EMA marginal — the
        strongest generative path in the framework, served (round-4
        VERDICT item 5). Geometry is validated at ATTACH time so a
        mismatched prior fails at startup, not on the first request.
        """
        from midi_vae_tpu.cli.train_prior import load_prior

        if self.latent_kind != "vq":
            raise ValueError(
                f"--prior needs a VQ-VAE checkpoint; this is a {self.model_name} "
                "(Gaussian latent — its prior is already N(0, I))"
            )
        prior, pparams, pcfg = load_prior(prior_path)
        if (int(pcfg["num_codes"]) != int(self.model.codebook_size)
                or int(pcfg["grid"]) != self.model.last_conv_size):
            raise ValueError(
                f"prior geometry (K={pcfg['num_codes']}, grid={pcfg['grid']}) does not "
                f"match the checkpoint (K={self.model.codebook_size}, "
                f"grid={self.model.last_conv_size})"
            )
        self._prior = (prior, pparams)
        self.prior_info = {
            "arch": str(pcfg.get("arch") or "pixelcnn"),
            "num_classes": int(pcfg.get("num_classes") or 0),
            "test_nll": pcfg.get("test_nll"),
            "path": prior_path,
        }

    def validate_labels(self, labels, n: int, num_classes: Optional[int] = None):
        """Normalize a request's label field: scalar broadcasts to [n].

        ``num_classes`` overrides the model's class count — ``/sample``
        with a class-conditional PRIOR conditions there even though the
        VQ model itself is unconditional.
        """
        classes = self.num_classes if num_classes is None else num_classes
        if classes <= 0:
            if labels is not None:
                raise ValueError("this checkpoint is unconditional; drop the label field")
            return None
        if labels is None:
            raise ValueError(
                f"conditional checkpoint: a label (0..{classes - 1}) is required "
                "('label' scalar or 'labels' list / ?label= query)"
            )
        arr = np.asarray(labels, np.int32)
        if arr.ndim == 0:
            arr = np.full((n,), int(arr), np.int32)
        if arr.shape != (n,):
            raise ValueError(f"labels must be a scalar or [n={n}] list, got shape {arr.shape}")
        if (arr < 0).any() or (arr >= classes).any():
            raise ValueError(f"labels must be in [0, {classes - 1}]")
        return arr

    def sample(self, n: int, seed: int = 0, label=None, temperature: float = 1.0,
               top_p: float | None = None) -> np.ndarray:
        from midi_vae_tpu.evaluation.inference import sample_prior
        from midi_vae_tpu.serving.batcher import _bucket

        if not (1 <= n <= self.MAX_SAMPLES):
            raise ValueError(f"n must be in [1, {self.MAX_SAMPLES}], got {n}")
        if not (0.0 < temperature <= 100.0):
            raise ValueError(f"temperature must be in (0, 100], got {temperature}")
        if top_p is not None and not (0.0 < top_p <= 1.0):
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        two_stage = self._prior is not None or (
            self._bundle is not None and hasattr(self._bundle, "sample")
        )
        if temperature != 1.0 and not two_stage:
            raise ValueError(
                "temperature applies to prior-backed (two-stage) sampling; this "
                "deployment has no code prior attached"
            )
        if top_p is not None and self._prior is None:
            raise ValueError(
                "top_p needs a checkpoint-backed code prior (--prior); the AOT "
                "sampler program bakes its sampling rule at export time"
            )
        prior_classes = int((self.prior_info or {}).get("num_classes") or 0)
        y = self.validate_labels(label, n, num_classes=prior_classes if two_stage else None)
        # sampling jits with n static — pad n up to a bucket size so
        # clients cycling through distinct n values hit a bounded compile
        # cache (same fix as the batcher's padded buckets) instead of one
        # full decoder compile per distinct n
        b = _bucket(n)
        if y is not None and b > n:
            y = np.concatenate([y, np.zeros(b - n, np.int32)])
        if self._prior is not None:
            # two-stage sampling: ancestral code draws → decode_indices —
            # identical math and key convention to `generate --prior`
            from midi_vae_tpu.models.prior import sample_codes_autoregressive
            from midi_vae_tpu.models.vq import VQVAE

            prior, pparams = self._prior
            idx = sample_codes_autoregressive(
                prior, pparams, jax.random.PRNGKey(seed), b, self.model.last_conv_size,
                temperature=temperature, y=jnp.asarray(y) if y is not None else None,
                top_p=top_p,
            )
            out = self.model.apply(
                {"params": self.params, "batch_stats": self.batch_stats}, idx,
                method=VQVAE.decode_indices,
            )
        elif self._bundle is not None:
            if hasattr(self._bundle, "sample"):
                # artifact exported with --prior: the whole two-stage sampler
                # (ancestral scan + decode) is one StableHLO program; the
                # label vector doubles as the batch-size carrier (zeros when
                # the prior is unconditional)
                slots = y if y is not None else np.zeros(b, np.int32)
                out = self._bundle.sample(
                    np.int32(seed), np.float32(temperature), slots
                )
            elif self.latent_kind == "vq":
                # the VQ prior is the EMA code-usage marginal, which lives in
                # the checkpoint's quantizer stats — a plain artifact exports
                # only reconstruct/encode/decode (a Gaussian draw pushed
                # through the exported decode would sample a different,
                # quantized-Gaussian distribution and silently misrepresent
                # the model's prior)
                raise ValueError(
                    "/sample is unavailable for this VQ-VAE artifact; re-export "
                    "with --prior to bake in the two-stage sampler, or serve "
                    "the checkpoint (--checkpoint [--prior])"
                )
            else:
                # AOT path: the artifact exports decode; the prior draw happens
                # here (same key convention as sample_prior)
                z = jax.random.normal(jax.random.PRNGKey(seed), (b, self.latent_dim), jnp.float32)
                out = self._bundle.decode(*((z, y) if y is not None else (z,)))
        else:
            out = sample_prior(
                self.model, self.params, self.batch_stats, jax.random.PRNGKey(seed), b, y=y
            )
        return np.asarray(out)[:n]

    def continue_rolls(self, x: np.ndarray, keep_cols: int, seed: int = 0, label=None,
                       temperature: float = 1.0, top_p: float | None = None) -> np.ndarray:
        """Two-stage continuation: encode [N, H, W, C] rolls to code grids,
        keep their first ``keep_cols`` TIME columns, let the attached code
        prior write the rest ancestrally, decode — the served twin of
        ``generate --mode continue`` (same forced-decoding semantics, see
        ``models/prior.py:sample_codes_autoregressive``)."""
        from midi_vae_tpu.models.prior import sample_codes_autoregressive
        from midi_vae_tpu.models.vq import VQVAE
        from midi_vae_tpu.serving.batcher import _bucket

        if self._prior is None:
            raise ValueError(
                "/continue needs a checkpoint-backed code prior (--prior); AOT "
                "artifacts bake a fixed sampler program and cannot encode-and-continue"
            )
        s = self.model.last_conv_size
        if not (0 < keep_cols < s):
            raise ValueError(
                f"keep_cols must be in [1, {s - 1}] (code grid is {s}x{s}), got {keep_cols}"
            )
        if not (0.0 < temperature <= 100.0):
            raise ValueError(f"temperature must be in (0, 100], got {temperature}")
        if top_p is not None and not (0.0 < top_p <= 1.0):
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        item = (self.image_size, self.image_size, self.channels)
        if x.ndim != 4 or x.shape[1:] != item:
            raise ValueError(f"images must be [N, {item[0]}, {item[1]}, {item[2]}], got {x.shape}")
        n = len(x)
        if n < 1:
            # an empty body would otherwise pad to bucket size 1 and run a
            # full encode→sample→decode just to return an empty array
            raise ValueError("need at least one image to continue, got an empty batch")
        prior_classes = int((self.prior_info or {}).get("num_classes") or 0)
        y = self.validate_labels(label, n, num_classes=prior_classes)
        # pad to a bucket size so clients cycling through distinct n values
        # hit a bounded compile cache (same rationale as /sample)
        b = _bucket(n)
        if b > n:
            x = np.concatenate([x, np.zeros((b - n, *item), np.float32)])
            if y is not None:
                y = np.concatenate([y, np.zeros(b - n, np.int32)])
        codes = self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            jnp.asarray(x, jnp.float32), method=VQVAE.encode_indices,
        )
        mask = np.zeros((s, s), bool)
        mask[:, :keep_cols] = True  # grid axis j = time (rolls are [pitch, time])
        prior, pparams = self._prior
        idx = sample_codes_autoregressive(
            prior, pparams, jax.random.PRNGKey(seed), b, s,
            temperature=temperature, y=jnp.asarray(y) if y is not None else None,
            top_p=top_p, known=codes, known_mask=jnp.asarray(mask),
        )
        out = self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats}, idx,
            method=VQVAE.decode_indices,
        )
        return np.asarray(out)[:n]

    MAX_INTERPOLATE_STEPS = 64  # bounds the [steps, H, W, C] result of one request

    def interpolate(self, a: np.ndarray, b: np.ndarray, steps: int, mode: str, label=None) -> np.ndarray:
        from midi_vae_tpu.evaluation.inference import interpolate

        # this path runs eagerly outside the micro-batcher, so an unvalidated
        # request could allocate an unbounded result and stall the process
        if not (2 <= steps <= self.MAX_INTERPOLATE_STEPS):
            raise ValueError(f"steps must be in [2, {self.MAX_INTERPOLATE_STEPS}], got {steps}")
        expect = (self.image_size, self.image_size, self.channels)
        for name, arr in (("a", a), ("b", b)):
            if tuple(arr.shape) != expect:
                raise ValueError(f"'{name}' must have shape {expect}, got {tuple(arr.shape)}")
        y = self.validate_labels(label, 1)
        if self._bundle is not None:
            return self._interpolate_from_bundle(a, b, steps, mode, y)
        path = interpolate(
            self.model, self.params, self.batch_stats,
            a[None], b[None], steps=steps, mode=mode,
            y=y,
        )
        return np.asarray(path[:, 0])  # [steps, H, W, C]

    def _interpolate_from_bundle(self, a, b, steps, mode, y) -> np.ndarray:
        """Compose /interpolate from the exported encode + decode programs
        (posterior means = first half of the encode payload), reusing
        evaluation/inference.py's lerp/slerp math — one implementation."""
        d = self.latent_dim
        x = np.stack([a, b]).astype(np.float32)
        yy = np.broadcast_to(y, (2,)).astype(np.int32) if y is not None else None
        enc = np.asarray(self._bundle.encode(*((x, yy) if yy is not None else (x,))))
        mu_a, mu_b = enc[0, :d], enc[1, :d]
        ts = np.linspace(0.0, 1.0, steps, dtype=np.float32)
        if mode == "lerp":
            zs = (1.0 - ts[:, None]) * mu_a[None] + ts[:, None] * mu_b[None]
        else:  # the live path's slerp helper, applied host-side
            from midi_vae_tpu.evaluation.inference import _slerp

            zs = np.asarray(_slerp(jnp.asarray(mu_a), jnp.asarray(mu_b), jnp.asarray(ts)[:, None]))
        zs = zs.astype(np.float32)
        ys = np.broadcast_to(y, (steps,)).astype(np.int32) if y is not None else None
        out = self._bundle.decode(*((zs, ys) if ys is not None else (zs,)))
        return np.asarray(out)

    def close(self):
        self.reconstruct.close()
        self.encode.close()


def make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _npy(self, code: int, arr: np.ndarray):
            body = npy_dumps(np.asarray(arr, np.float32))
            self.send_response(code)
            self.send_header("Content-Type", NPY_CONTENT_TYPE)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "model": service.model_name,
                    "image_size": service.image_size,
                    "latent_dim": service.latent_dim,
                    "conditional": service.conditional,
                    "num_classes": service.num_classes,
                    # two-stage deployments (--prior / prior-baked artifacts)
                    "prior": service.prior_info,
                    # both batchers' counters: an encode-dominated deployment
                    # must not look idle on the dashboard
                    "batches_dispatched": service.reconstruct.batches_dispatched,
                    "requests_served": service.reconstruct.requests_served,
                    "encode_batches_dispatched": service.encode.batches_dispatched,
                    "encode_requests_served": service.encode.requests_served,
                })
            else:
                self._json(404, {"error": "unknown path"})

        # caps mirror MAX_SAMPLES/MAX_INTERPOLATE_STEPS: one request must not
        # allocate an unbounded device batch or buffer an unbounded body
        MAX_REQUEST_ITEMS = 1024
        MAX_BODY_BYTES = 256 * (1 << 20)

        def do_POST(self):
            try:
                split = urlsplit(self.path)
                route, query = split.path, parse_qs(split.query)
                length = int(self.headers.get("Content-Length", "0"))
                if length > self.MAX_BODY_BYTES:
                    self._json(413, {"error": f"body exceeds {self.MAX_BODY_BYTES} bytes"})
                    return
                raw = self.rfile.read(length)
                ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip().lower()
                binary_req = ctype in _BINARY_CONTENT_TYPES
                # binary in → binary out; JSON clients opt in via Accept
                wants_npy = binary_req or NPY_CONTENT_TYPE in (self.headers.get("Accept") or "")
                payload = {} if binary_req else json.loads(raw or b"{}")

                def req_labels():
                    """Label(s) for conditional checkpoints: JSON 'labels'
                    (per item) / 'label' (scalar), or ?label= / ?labels=csv
                    on the query string (the binary wire's only channel)."""
                    if not binary_req and "labels" in payload:
                        return payload["labels"]
                    if not binary_req and "label" in payload:
                        return payload["label"]
                    if "labels" in query:
                        return [int(v) for v in query["labels"][0].split(",")]
                    if "label" in query:
                        return int(query["label"][0])
                    return None

                if route == "/sample":
                    if binary_req:
                        raise ValueError("/sample takes JSON parameters ({'n', 'seed'}), not a tensor body")
                    n = int(payload.get("n", 1))
                    top_p = payload.get("top_p")
                    out = service.sample(n, int(payload.get("seed", 0)), label=req_labels(),
                                         temperature=float(payload.get("temperature", 1.0)),
                                         top_p=float(top_p) if top_p is not None else None)
                    if wants_npy:
                        self._npy(200, out)
                    else:
                        self._json(200, {"samples": out.tolist()})
                elif route == "/interpolate":
                    if binary_req:
                        # one npy [2, H, W, C] array carries both endpoints;
                        # steps/slerp ride the query string (a tensor body
                        # has nowhere to put scalar parameters)
                        ends = np.asarray(npy_loads(raw), np.float32)
                        if ends.ndim != 4 or len(ends) != 2:
                            raise ValueError(f"binary /interpolate expects one [2,H,W,C] array, got {ends.shape}")
                        a, b = ends[0], ends[1]
                        steps = int(query.get("steps", ["8"])[0])
                        slerp_q = query.get("slerp", ["0"])[0].lower()
                        mode = "slerp" if slerp_q in ("1", "true", "yes") else "lerp"
                    else:
                        a = np.asarray(payload["a"], np.float32)
                        b = np.asarray(payload["b"], np.float32)
                        steps = int(payload.get("steps", 8))
                        mode = "slerp" if payload.get("slerp") else "lerp"
                    out = service.interpolate(a, b, steps=steps, mode=mode, label=req_labels())
                    if wants_npy:
                        self._npy(200, out)
                    else:
                        self._json(200, {"path": out.tolist()})
                elif route == "/continue":
                    # tensor body (npy or JSON 'images') + scalar params on
                    # the JSON body / query string (binary wire's channel)
                    if binary_req:
                        x = np.asarray(npy_loads(raw), np.float32)
                        keep = int(query.get("keep_cols", ["0"])[0])
                        seed = int(query.get("seed", ["0"])[0])
                        temp = float(query.get("temperature", ["1.0"])[0])
                        tp_q = query.get("top_p", [None])[0]
                        top_p = float(tp_q) if tp_q is not None else None
                    else:
                        x = np.asarray(payload["images"], np.float32)
                        if "keep_cols" not in payload:
                            # defaulting to 0 would produce the misleading
                            # "must be in [1, s-1] ... got 0" instead of
                            # naming the missing required field
                            raise ValueError(
                                "'keep_cols' is required for /continue "
                                "(number of leading code TIME columns to keep)"
                            )
                        keep = int(payload["keep_cols"])
                        seed = int(payload.get("seed", 0))
                        temp = float(payload.get("temperature", 1.0))
                        tp = payload.get("top_p")
                        top_p = float(tp) if tp is not None else None
                    if x.ndim == 3:
                        x = x[None]
                    if len(x) > self.MAX_REQUEST_ITEMS:
                        raise ValueError(
                            f"at most {self.MAX_REQUEST_ITEMS} images per request, got {len(x)}"
                        )
                    out = service.continue_rolls(
                        x, keep, seed=seed, label=req_labels(), temperature=temp, top_p=top_p
                    )
                    if wants_npy:
                        self._npy(200, out)
                    else:
                        self._json(200, {"continuations": out.tolist()})
                elif route in ("/reconstruct", "/encode"):
                    if binary_req:
                        x = np.asarray(npy_loads(raw), np.float32)
                    else:
                        x = np.asarray(payload["images"], np.float32)
                    if x.ndim == 3:
                        x = x[None]
                    if len(x) > self.MAX_REQUEST_ITEMS:
                        raise ValueError(
                            f"at most {self.MAX_REQUEST_ITEMS} images per request, got {len(x)}"
                        )
                    out = getattr(service, route[1:])(x, service.validate_labels(req_labels(), len(x)))
                    if route == "/reconstruct":
                        if wants_npy:
                            self._npy(200, out)
                        else:
                            self._json(200, {"reconstructions": out.tolist()})
                    elif wants_npy:
                        # [N, 2*latent_dim]: mu ‖ log_var halves (see module docstring)
                        self._npy(200, out)
                    else:
                        d = service.latent_dim
                        self._json(200, {"mu": out[:, :d].tolist(), "log_var": out[:, d:].tolist()})
                else:
                    self._json(404, {"error": "unknown path"})
            # EOFError: truncated npy bodies (read_array hits end-of-buffer)
            except (ValueError, KeyError, TypeError, EOFError, json.JSONDecodeError) as e:
                # malformed input is the client's fault
                self._json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 - report, don't crash the server
                # device/compile/batcher failures are OURS: surface as 5xx so
                # monitors see a dying server, not a bad client
                self._json(500, {"error": str(e)})

    return Handler


def serve(
    checkpoint: Optional[str] = None,
    port: int = 8000,
    host: str = "127.0.0.1",
    *,
    artifact: Optional[str] = None,
    prior: Optional[str] = None,
) -> ThreadingHTTPServer:
    """Start the server (returns it; call ``.shutdown()`` to stop).

    Pass ``checkpoint`` (a training checkpoint; needs the model code) or
    ``artifact`` (an AOT-exported directory, interop/aot_export.py).
    ``prior`` attaches a trained code prior to a VQ checkpoint — ``/sample``
    then serves the two-stage ancestral sampler (artifacts bake the prior
    in at export time instead: ``aot_export --prior``).
    """
    if (checkpoint is None) == (artifact is None):
        raise ValueError("pass exactly one of checkpoint= or artifact=")
    if artifact is not None:
        if prior is not None:
            raise ValueError(
                "artifacts carry their prior from export time (aot_export --prior); "
                "--prior applies to --checkpoint serving"
            )
        service = InferenceService.from_artifact(artifact)
    else:
        service = InferenceService(checkpoint, prior_path=prior)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    httpd.service = service  # type: ignore[attr-defined]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    print(f"serving {checkpoint or artifact} on http://{host}:{httpd.server_address[1]}")
    return httpd


def cli(argv: Optional[list] = None):
    parser = argparse.ArgumentParser(description="Serve a trained VAE checkpoint over HTTP")
    source = parser.add_mutually_exclusive_group(required=True)
    source.add_argument("--checkpoint", help="Training checkpoint (.msgpack or Orbax dir)")
    source.add_argument("--artifact", metavar="DIR",
                        help="AOT-exported artifact directory (interop/aot_export.py): serve "
                             "the StableHLO programs — no model code or checkpoint needed")
    parser.add_argument("--prior", metavar="PATH", default=None,
                        help="Trained code prior (cli/train_prior.py) for a VQ checkpoint: "
                             "/sample serves the two-stage ancestral sampler instead of the "
                             "EMA code marginal. Artifacts bake the prior at export time.")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--compilation-cache", type=str, default=None, metavar="DIR",
                        help="Persistent XLA compilation-cache directory: server restarts "
                             "load the compiled encode/decode programs from disk instead of "
                             "paying the cold-start compile.")
    parser.add_argument("--cpu", action="store_true",
                        help="Force the CPU backend (like the other CLIs; also skips the probe).")
    parser.add_argument("--skip-backend-check", action="store_true",
                        help="Skip the startup device-liveness probe (e.g. CPU-only serving).")
    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not (args.skip_backend_check or args.cpu):
        from midi_vae_tpu.core.backend_check import backend_alive

        # a dead tunnel would otherwise wedge the server at its first
        # compile with no error and no listening socket (backend_check.py)
        if not backend_alive():
            print("FATAL: JAX backend unreachable (device probe never completed); not starting",
                  file=sys.stderr)
            raise SystemExit(1)
    if args.compilation_cache:
        from midi_vae_tpu.core.compile_cache import enable_compilation_cache

        print(f"persistent compilation cache: {enable_compilation_cache(args.compilation_cache)}")
    httpd = serve(args.checkpoint, args.port, args.host, artifact=args.artifact,
                  prior=args.prior)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    cli()

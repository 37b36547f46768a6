"""Serving subsystem: micro-batched inference over a trained checkpoint.

Capability extension (the reference has no serving path; its inference
API surface — ``sample``/``generate``, models.py:250-272 — is never
called by any script). Design is TPU-first: requests coalesce into
fixed-size batches (static shapes → one compiled program per bucket),
the device runs one jitted call per batch, and padding is trimmed per
request. See :mod:`batcher` for the queueing core and :mod:`server`
for the HTTP front end.
"""

from midi_vae_tpu.serving.batcher import MicroBatcher  # noqa: F401
from midi_vae_tpu.serving.client import ServingClient, ServingError  # noqa: F401
from midi_vae_tpu.serving.wire import NPY_CONTENT_TYPE, npy_dumps, npy_loads  # noqa: F401

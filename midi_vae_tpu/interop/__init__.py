"""Interoperability with the PyTorch reference (torch-vae).

``torch_import`` converts a reference checkpoint's ``state_dict`` into
flax variables for :class:`~midi_vae_tpu.models.vae.VanillaVAE` built
with ``torch_compat=True`` — bit-level activation parity, so users
migrating from the reference can carry trained weights across.
"""

from midi_vae_tpu.interop.torch_import import import_reference_state_dict  # noqa: F401

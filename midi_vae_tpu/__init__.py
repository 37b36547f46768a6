"""midi_vae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) MIDI piano-roll VAE framework.

Re-designed TPU-first from the capability surface of the PyTorch reference
``finlaymiller/torch-vae`` (``midi_autoencoder`` package):

- functional core: pure jitted ``train_step``/``eval_step`` over pytrees,
  explicit PRNG keys, optax optimizer state
- NHWC layouts, static shapes, XLA ``conv_general_dilated`` on the MXU
- data parallelism via ``jax.sharding.Mesh`` + jit auto-partitioning
  (gradient reduction compiles to ``psum`` over ICI)
- fused Pallas kernels for the reparameterization + ELBO hot path
- on-device jit data transforms feeding a double-buffered input pipeline
"""

from midi_vae_tpu.__meta__ import __version__  # noqa: F401

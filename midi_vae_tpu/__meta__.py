name = "midi-vae-tpu"
path = name.replace("-", "_")
version = "0.1.0"
license = "Unlicense"
description = "TPU-native JAX/XLA/Pallas framework for MIDI piano-roll variational autoencoders"

__version__ = version

from midi_vae_tpu.models.mlp import MLPVAE  # noqa: F401
from midi_vae_tpu.models.registry import MODEL_REGISTRY, build_model  # noqa: F401
from midi_vae_tpu.models.vae import VanillaVAE  # noqa: F401

from midi_vae_tpu.losses.elbo import bce_from_logits, elbo_loss, kl_gaussian  # noqa: F401
from midi_vae_tpu.losses.schedules import kl_weight_schedule  # noqa: F401

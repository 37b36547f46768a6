from midi_vae_tpu.ops.fused_elbo import fused_bce_mean, fused_reparam_kl  # noqa: F401

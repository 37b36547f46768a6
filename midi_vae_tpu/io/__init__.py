from midi_vae_tpu.io.checkpoint import load_checkpoint, restore_config, save_checkpoint  # noqa: F401

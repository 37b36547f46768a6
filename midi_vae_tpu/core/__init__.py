from midi_vae_tpu.core.types import EncoderOutput, LossOutput, ModelOutput  # noqa: F401

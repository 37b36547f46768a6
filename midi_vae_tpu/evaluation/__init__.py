from midi_vae_tpu.evaluation.evaluate import evaluate, make_eval_step  # noqa: F401
from midi_vae_tpu.evaluation.inference import interpolate, reconstruct, sample_prior  # noqa: F401
from midi_vae_tpu.evaluation.iwae import iwae_bound, make_iwae_step  # noqa: F401

from midi_vae_tpu.data.fetch import fetch_dataset  # noqa: F401
from midi_vae_tpu.data.registry import image_dataset_sizes  # noqa: F401
from midi_vae_tpu.data.sources import ArrayDataset  # noqa: F401
from midi_vae_tpu.data.transforms import TransformSpec, get_transform  # noqa: F401

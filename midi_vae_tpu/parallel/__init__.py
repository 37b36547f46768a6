from midi_vae_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_mesh_multislice,
    replicate,
)

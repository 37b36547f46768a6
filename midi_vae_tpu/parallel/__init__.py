from midi_vae_tpu.parallel.mesh import batch_sharding, make_mesh, replicate  # noqa: F401

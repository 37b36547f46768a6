from midi_vae_tpu.native.rrd import (  # noqa: F401
    NativeDataset,
    NativeLoader,
    native_available,
    write_rrd,
)

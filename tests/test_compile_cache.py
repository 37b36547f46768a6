"""Persistent XLA compilation cache (core/compile_cache.py).

The point of the feature is operational: a preemption resume (or a
serving redeploy) re-jits its programs from disk instead of re-running
XLA. These tests assert the mechanism end-to-end — enabling the cache
populates the directory, and the train loop wires the config field
through — while leaving the process-global jax config as they found it.
"""

import os

import jax
import pytest

from midi_vae_tpu.core.compile_cache import enable_compilation_cache


@pytest.fixture
def restore_cache_config():
    """Leave the process-global cache config as we found it."""
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min_time = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_min_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    yield
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min_time)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_min_size)


def test_enable_populates_cache_dir(tmp_path, restore_cache_config):
    cache_dir = tmp_path / "xla-cache"
    returned = enable_compilation_cache(str(cache_dir), min_compile_time_secs=0)
    assert returned == str(cache_dir)
    assert os.path.isdir(returned)

    @jax.jit
    def program(x):
        return (x * 2.0 + 1.0).sum()

    jax.block_until_ready(program(jax.numpy.arange(128.0).reshape(8, 16)))
    entries = os.listdir(returned)
    assert entries, "jit compile wrote no persistent cache entries"


def test_flag_reaches_config_and_loop_enables_it(tmp_path, restore_cache_config):
    """--compilation-cache flows CLI → TrainConfig → run(), which must
    enable the cache before its first compile (a real 1-epoch run on the
    synthetic dataset, then the directory holds the train step)."""
    from midi_vae_tpu.cli.train import args_to_config, get_parser
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    cache_dir = tmp_path / "preemption-cache"
    argv = ["--compilation-cache", str(cache_dir)]
    config = args_to_config(get_parser().parse_args(argv), argv)
    assert config.compilation_cache == str(cache_dir)

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        arch="MLPVAE",
        n_features=8,
        hidden_dims=(64,),
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "models"),
        log_images=False,
        compilation_cache=str(cache_dir),
    )
    run(config)
    assert os.path.isdir(str(cache_dir))
    # the train step takes well over the default 1 s threshold on CPU, but
    # run() must have routed through enable_compilation_cache regardless
    assert jax.config.jax_compilation_cache_dir == str(cache_dir)

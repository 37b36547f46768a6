"""Double-buffered host→device input pipeline.

TPU-native replacement for the reference's DataLoader stack
(train.py:168-191): no worker processes, no pinned-memory staging.
Batches are sliced from contiguous host uint8 arrays, copied to device
asynchronously (``jax.device_put`` dispatch is non-blocking), and the
whole transform stack runs as one jitted program on device. A small
prefetch queue keeps ``prefetch`` batches in flight so the H2D copy of
batch N+1 overlaps the compute of batch N — the double-buffering the
BASELINE north star asks for, without Pallas DMA because PCIe copy and
XLA execution already overlap at the runtime level.

Epoch shuffling derives from resume-stable per-epoch seeds
(:func:`midi_vae_tpu.core.rng.host_rng`), replacing the sampler
reseeding at train.py:345-369. Eval padding: the final partial batch is
zero-padded to full shape with a validity mask — the static-shape
equivalent of the DistributedSampler pad + trim at evaluation.py:86-93.
"""

from __future__ import annotations

import collections
import weakref
from typing import Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from midi_vae_tpu.core.rng import epoch_key, host_rng
from midi_vae_tpu.data.sources import ArrayDataset
from midi_vae_tpu.data.transforms import apply_transform


class Batch(NamedTuple):
    """One device-resident batch. ``mask`` flags real (non-pad) samples."""

    x: jax.Array  # transformed images, float32 [B, S, S, C]
    y: jax.Array  # labels int32 [B]
    mask: jax.Array  # float32 [B], 1.0 = real sample, 0.0 = padding


def put_sharded(arr: np.ndarray, sharding: Optional[jax.sharding.Sharding]) -> jax.Array:
    """Host array → (sharded) device array, multi-host aware.

    Single-process: plain ``device_put``. Multi-process (a TPU pod with
    one JAX process per host, ``jax.distributed.initialize``): ``arr``
    is this process's *local* slice of the global batch, assembled into
    one global array via ``make_array_from_process_local_data`` — the
    single-controller replacement for the reference's per-rank
    DistributedSampler shards (train.py:165-166, 371-375).
    """
    if sharding is None:
        return jax.device_put(arr)
    if jax.process_count() > 1 and isinstance(sharding, jax.sharding.NamedSharding):
        return jax.make_array_from_process_local_data(sharding, arr)
    return jax.device_put(arr, sharding)


class DeviceLoader:
    """Iterate an :class:`ArrayDataset` as device batches.

    Parameters
    ----------
    dataset : ArrayDataset with a transform spec attached
    batch_size : int — the *global* batch size (already scaled by the
        data-parallel world size, as at train.py:166)
    train : bool — train mode shuffles and drops the last partial batch
        (dl_train_kwargs, train.py:168-174); eval mode keeps order and
        pads the final batch (dl_test_kwargs, train.py:175-181)
    seed : int — base seed for epoch shuffling and random crops
    sharding : optional jax.sharding.Sharding for the batch arrays
        (e.g. NamedSharding(mesh, P("data", ...)) for data parallelism)
    prefetch : number of batches to keep in flight
    """

    def __init__(
        self,
        dataset: ArrayDataset,
        batch_size: int,
        *,
        train: bool,
        seed: int = 0,
        sharding: Optional[jax.sharding.Sharding] = None,
        prefetch: int = 2,
    ):
        if len(dataset) == 0:
            raise ValueError("empty dataset")
        self.dataset = dataset
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        self.prefetch = max(1, prefetch)
        self._x_sharding = sharding
        n = len(dataset)
        self.num_batches = n // batch_size if train else -(-n // batch_size)
        if self.num_batches == 0:
            raise ValueError(f"dataset of {n} samples yields no batches at batch_size={batch_size} (drop_last)")

    def __len__(self) -> int:
        return self.num_batches

    @property
    def num_samples(self) -> int:
        """Samples yielded per epoch (post drop_last / pre padding)."""
        n = len(self.dataset)
        return self.num_batches * self.batch_size if self.train else n

    def _make_host_batch(self, indices: np.ndarray, size: Optional[int] = None):
        size = size if size is not None else self.batch_size
        images = self.dataset.images[indices]
        labels = self.dataset.labels[indices]
        pad = size - len(indices)
        mask = np.ones(size, np.float32)
        if pad:
            images = np.concatenate([images, np.zeros((pad, *images.shape[1:]), images.dtype)])
            labels = np.concatenate([labels, np.zeros(pad, labels.dtype)])
            mask[len(indices) :] = 0.0
        return images, labels.astype(np.int32), mask

    def epoch(self, epoch: int = 1) -> Iterator[Batch]:
        """Yield the batches of one epoch (epochs indexed from 1)."""
        n = len(self.dataset)
        if self.train:
            order = host_rng(self.seed, epoch).permutation(n)
            order = order[: self.num_batches * self.batch_size]
        else:
            order = np.arange(n)
        ekey = epoch_key(self.seed, epoch) if self.train else None

        spec = self.dataset.transform

        # Multi-host: every process walks the SAME deterministic order (the
        # seed is shared config) and materializes only its slice of each
        # global batch; put_sharded assembles the global array.
        n_proc = jax.process_count()
        if n_proc > 1 and self.batch_size % n_proc:
            raise ValueError(
                f"global batch size {self.batch_size} must divide evenly across "
                f"{n_proc} processes — remainder samples would silently never be served"
            )
        local_bs = self.batch_size // n_proc
        rank = jax.process_index()

        def launch(batch_idx: int) -> Batch:
            lo = batch_idx * self.batch_size
            global_idx = order[lo : lo + self.batch_size]
            if n_proc > 1:
                # pad the global slice first so every process sees the same
                # padding layout, then take the local window
                pad = self.batch_size - len(global_idx)
                local_idx = global_idx[rank * local_bs : (rank + 1) * local_bs]
                images, labels, mask = self._make_host_batch(local_idx, size=local_bs)
                if pad:  # recompute mask from global positions
                    pos = np.arange(rank * local_bs, (rank + 1) * local_bs)
                    mask = (pos < len(global_idx)).astype(np.float32)
            else:
                images, labels, mask = self._make_host_batch(global_idx)
            scalar_sh = self._x_sharding and _scalar_sharding(self._x_sharding)
            x = put_sharded(images, self._x_sharding)
            y = put_sharded(labels, scalar_sh)
            m = put_sharded(mask, scalar_sh)
            key = jax.random.fold_in(ekey, batch_idx) if (ekey is not None and spec is not None) else None
            if spec is not None:
                x = apply_transform(spec, x, key)
            else:
                x = _scale_only(x)
            return Batch(x=x, y=y, mask=m)

        queue: collections.deque = collections.deque()
        for i in range(self.num_batches):
            queue.append(launch(i))
            if len(queue) > self.prefetch:
                yield queue.popleft()
        while queue:
            yield queue.popleft()


class NativeDeviceLoader:
    """:class:`DeviceLoader`-shaped iterator over an out-of-core
    :class:`~midi_vae_tpu.data.sources.RRDStreamDataset`.

    Host batching (shuffled gather from the mmap-ed file) runs on the
    C++ thread pool (``native/rollloader.cc``); this class only moves
    finished uint8 batches to device and applies the jitted transform —
    so datasets larger than host RAM feed the chip at full rate. Same
    epoch/len/num_samples surface as :class:`DeviceLoader`.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        train: bool,
        seed: int = 0,
        sharding: Optional[jax.sharding.Sharding] = None,
        prefetch: int = 2,
        n_threads: int = 4,
    ):
        from midi_vae_tpu.native.rrd import NativeDataset, NativeLoader

        if len(dataset) == 0:
            raise ValueError("empty dataset")
        self._n_proc = jax.process_count()
        self._rank = jax.process_index()
        if self._n_proc > 1 and batch_size % self._n_proc:
            raise ValueError(
                f"global batch size {batch_size} must divide evenly across {self._n_proc} processes"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch_size = batch_size // self._n_proc
        self.train = train
        self.seed = seed
        self.prefetch = max(1, prefetch)
        self._n_threads = n_threads
        self._x_sharding = sharding
        self._native_ds = NativeDataset(dataset.path)
        # one persistent loader either way: single-process serves full global
        # batches with C++-side shuffling; multi-process serves this host's
        # local_batch_size windows, re-targeted per epoch via set_indices
        self._loader = NativeLoader(
            self._native_ds,
            batch_size if self._n_proc == 1 else self.local_batch_size,
            drop_last=train if self._n_proc == 1 else False,
            n_threads=n_threads,
            prefetch_depth=max(2, prefetch + 1),
            indices=dataset.indices if self._n_proc == 1 else None,
            reuse_buffers=False,  # batches go straight to async device_put
        )
        n = len(dataset)
        self.num_batches = n // batch_size if train else -(-n // batch_size)
        if self.num_batches == 0:
            raise ValueError(
                f"dataset of {n} samples yields no batches at batch_size={batch_size} (drop_last)"
            )

    def __len__(self) -> int:
        return self.num_batches

    @property
    def num_samples(self) -> int:
        n = len(self.dataset)
        return self.num_batches * self.batch_size if self.train else n

    def _multiproc_epoch_indices(self, epoch: int):
        """Retarget the persistent loader at THIS process's slice of each
        global batch: every host walks the same shuffled order (shared seed —
        loop.py broadcasts wall-clock seeds), takes its contiguous window of
        every batch, and streams those rows. Positions map contiguously, so
        the final eval batch's zero-pad tail lands on the trailing hosts
        exactly like DeviceLoader's layout (the C++ loader memsets pad rows)."""
        idx = self.dataset.indices
        order = host_rng(self.seed, epoch).permutation(idx) if self.train else np.asarray(idx)
        if self.train:
            order = order[: self.num_batches * self.batch_size]
        lbs, B, rank = self.local_batch_size, self.batch_size, self._rank
        windows = [
            order[min(b * B + rank * lbs, len(order)) : min(b * B + (rank + 1) * lbs, len(order))]
            for b in range(self.num_batches)
        ]
        self._loader.set_indices(np.concatenate(windows) if windows else np.zeros(0, np.int64))
        return [len(w) for w in windows]

    def epoch(self, epoch: int = 1) -> Iterator[Batch]:
        ekey = epoch_key(self.seed, epoch) if self.train else None
        spec = self.dataset.transform
        local_bs = self.local_batch_size

        def launch(batch_idx: int, images, labels, valid) -> Batch:
            mask = np.zeros(local_bs, np.float32)
            mask[:valid] = 1.0
            scalar_sh = self._x_sharding and _scalar_sharding(self._x_sharding)
            x = put_sharded(images, self._x_sharding)
            y = put_sharded(labels.astype(np.int32), scalar_sh)
            m = put_sharded(mask, scalar_sh)
            key = jax.random.fold_in(ekey, batch_idx) if (ekey is not None and spec is not None) else None
            x = apply_transform(spec, x, key) if spec is not None else _scale_only(x)
            return Batch(x=x, y=y, mask=m)

        if self._n_proc == 1:
            # resume-stable seed derivation, as DeviceLoader
            epoch_seed = int(host_rng(self.seed, epoch).integers(0, 2**63 - 1)) if self.train else 0
            source = self._loader.epoch(seed=epoch_seed, shuffle=self.train)
        else:
            valids = self._multiproc_epoch_indices(epoch)

            def _source():
                # every host must emit exactly num_batches batches (collectives
                # run per batch) — a host whose slice of the final global batch
                # is empty emits an all-padding batch instead of stopping early
                it = self._loader.epoch(seed=0, shuffle=False)
                ds = self._native_ds
                for i in range(self.num_batches):
                    if valids[i] == 0:
                        yield (
                            np.zeros((local_bs, ds.h, ds.w, ds.c), np.uint8),
                            np.zeros(local_bs, np.int64),
                            0,
                        )
                    else:
                        img, lbl, _ = next(it)
                        yield img, lbl, valids[i]

            source = _source()

        queue: collections.deque = collections.deque()
        for i, (images, labels, valid) in enumerate(source):
            queue.append(launch(i, images, labels, valid))
            if len(queue) > self.prefetch:
                yield queue.popleft()
        while queue:
            yield queue.popleft()

    def close(self):
        if self._loader is not None:
            self._loader.close()
        self._native_ds.close()


class DeviceResidentLoader:
    """Device-resident corpus: upload the uint8 corpus ONCE, then run the
    shuffled gather + transform of every batch inside one jitted program.

    The host loaders above pay a host→device copy per batch — on a local
    PCIe link that overlaps compute, but through a remote-TPU tunnel a
    ``device_put`` round-trip costs ~1 s regardless of size (RESULTS.md
    "Host-fed training": 1,811 samples/sec vs 190k on-device). Any corpus
    that fits an HBM budget can instead live on device: per epoch one
    small index-array upload (the resume-stable permutation), per batch
    only a scalar batch index crosses the link — the gather, zero-pad,
    and transform all run on device.

    Batch-for-batch EQUIVALENT to :class:`DeviceLoader` (tested): same
    ``host_rng`` epoch permutation, same per-batch crop-key derivation,
    same zero-padding/mask layout for the final eval batch.

    Multi-process (multi-controller SPMD) works too: every process holds
    the same host corpus (same fetch, same broadcast seed), so the
    replicated corpus and the batch-sharded planes are assembled as
    global arrays from identical process-local data
    (``jax.make_array_from_callback`` — no cross-host transfer; each
    process uploads only to its own devices). Requires a
    ``NamedSharding`` over the global mesh. ``make_loader``'s ``auto``
    placement stays host-fed on pods (local PCIe overlaps compute; the
    device-resident win targets hosts with expensive transfer links) —
    opt in with ``--data-placement device``.
    """

    def __init__(
        self,
        dataset: ArrayDataset,
        batch_size: int,
        *,
        train: bool,
        seed: int = 0,
        sharding: Optional[jax.sharding.Sharding] = None,
        prefetch: int = 2,  # accepted for interface parity; gathers are already async
    ):
        self._multiproc = jax.process_count() > 1
        if self._multiproc and not isinstance(sharding, jax.sharding.NamedSharding):
            raise ValueError(
                "multi-process device-resident placement needs a NamedSharding over the global mesh"
            )
        if len(dataset) == 0:
            raise ValueError("empty dataset")
        self.dataset = dataset
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        n = len(dataset)
        self.num_batches = n // batch_size if train else -(-n // batch_size)
        if self.num_batches == 0:
            raise ValueError(f"dataset of {n} samples yields no batches at batch_size={batch_size} (drop_last)")

        self._x_sharding = sharding
        if isinstance(sharding, jax.sharding.NamedSharding):
            mesh = sharding.mesh
            replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            batch_axis = sharding.spec[0] if len(sharding.spec) else None
            # [num_batches, B] index/mask planes: shard the BATCH axis so each
            # device gathers exactly its slice of every batch locally
            self._plane_sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, batch_axis)
            )
        else:
            replicated = None
            self._plane_sharding = None
        # THE one-time corpus upload (uint8 — 4× less link traffic than f32)
        self._images = self._put_global(dataset.images, replicated)
        self._labels = self._put_global(dataset.labels.astype(np.int32), replicated)

        spec = dataset.transform
        use_key = bool(train) and spec is not None

        def make_batch(images, labels, order, masks, batch_idx, ekey):
            idx = jax.lax.dynamic_index_in_dim(order, batch_idx, axis=0, keepdims=False)
            mask = jax.lax.dynamic_index_in_dim(masks, batch_idx, axis=0, keepdims=False)
            rows = jnp.take(images, idx, axis=0)
            # zero the pad rows BEFORE the transform — identical to
            # DeviceLoader's zero-padded host batch (pad gathers row 0)
            rows = rows * mask.astype(rows.dtype).reshape(-1, *([1] * (rows.ndim - 1)))
            y = jnp.where(mask > 0, jnp.take(labels, idx, axis=0), 0)
            key = jax.random.fold_in(ekey, batch_idx) if use_key else None
            x = apply_transform(spec, rows, key) if spec is not None else _scale_only(rows)
            return x, y, mask

        self._batch_core = make_batch  # raw, for composition into scan programs
        self._make_batch = jax.jit(make_batch)
        self._scan_cache: dict = {}
        self.corpus_nbytes = int(self._images.nbytes) + int(self._labels.nbytes)
        _resident_loaders.add(self)

    def _put_global(self, arr: np.ndarray, sharding):
        """Place a host array on the (possibly multi-process) mesh.

        Single-process: plain ``device_put`` (one transfer + broadcast).
        Multi-controller: ``device_put`` cannot address remote shards, so
        the global array is assembled from process-local data — every
        process holds the identical full host array (same dataset fetch,
        same broadcast seed for the epoch planes) and the callback hands
        each local device its shard. No cross-host data movement.
        """
        arr = np.ascontiguousarray(arr)
        if not self._multiproc:
            return jax.device_put(arr, sharding)
        return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])

    def release(self) -> None:
        """Drop the on-device corpus and leave the HBM data budget.

        For callers that are done iterating but want to upload another
        device-resident corpus within the budget (e.g. the final
        train-under-eval-conditions pass re-uploads the train split with
        eval transforms). The loader is unusable afterwards.
        """
        self._images = None
        self._labels = None
        self.corpus_nbytes = 0
        _resident_loaders.discard(self)

    def __len__(self) -> int:
        return self.num_batches

    @property
    def num_samples(self) -> int:
        n = len(self.dataset)
        return self.num_batches * self.batch_size if self.train else n

    def epoch(self, epoch: int = 1) -> Iterator[Batch]:
        nb = self.num_batches
        # the epoch's ONLY data upload: [num_batches, B] int32 + f32 planes
        order_dev, masks_dev = self._epoch_planes(epoch)
        ekey = epoch_key(self.seed, epoch)  # harmless for eval (use_key baked False)

        for i in range(nb):
            x, y, m = self._make_batch(
                self._images, self._labels, order_dev, masks_dev, jnp.int32(i), ekey
            )
            yield Batch(x=x, y=y, mask=m)

    def _epoch_planes(self, epoch: int):
        """The per-epoch [num_batches, B] order/mask planes (device-resident)."""
        n = len(self.dataset)
        B, nb = self.batch_size, self.num_batches
        if self.train:
            order = host_rng(self.seed, epoch).permutation(n)[: nb * B]
            masks = np.ones(nb * B, np.float32)
        else:
            order = np.arange(n)
            pad = nb * B - n
            if pad:
                order = np.concatenate([order, np.zeros(pad, order.dtype)])
            masks = (np.arange(nb * B) < n).astype(np.float32)
        order_dev = self._put_global(order.reshape(nb, B).astype(np.int32), self._plane_sharding)
        masks_dev = self._put_global(masks.reshape(nb, B), self._plane_sharding)
        return order_dev, masks_dev

    def _chunk_program(self, raw_step):
        """Memoized compiled program: scan ``n_steps`` train steps over the
        device-resident corpus, no host involvement inside the chunk."""
        import functools

        # keyed by the function OBJECT (not id()): an id-keyed cache without
        # a reference would hand a recycled id the stale program compiled
        # for a previous, freed train step — silent wrong-optimizer training
        if raw_step not in self._scan_cache:
            core = self._batch_core

            @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0,))
            def run_chunk(state, images, labels, order, masks, start, ekey, n_steps):
                def body(st, i):
                    x, y, _ = core(images, labels, order, masks, i, ekey)
                    # raw steps take (state, x, y, key); unconditional ignore y
                    st, lo, gn = raw_step(st, x, y, ekey)
                    return st, jnp.stack(
                        [
                            lo.loss,
                            lo.reconstruction_loss,
                            lo.kld_loss,
                            lo.kld_weight,
                            gn,
                        ]
                    ).astype(jnp.float32)

                return jax.lax.scan(body, state, start + jnp.arange(n_steps))

            self._scan_cache[raw_step] = run_chunk
        return self._scan_cache[raw_step]

    def epoch_scan(self, state, raw_step, epoch: int, chunk: int = 64):
        """One TRAIN epoch as scan-chunked compiled programs.

        The per-batch ``epoch()`` path pays 2-3 host→device round trips
        per step — negligible on local PCIe, dominant through a remote
        tunnel (measured: the per-batch device-resident path trains at
        13.6k samples/sec in this environment where the pure-compute rate
        is ~190k). Scanning ``chunk`` steps inside ONE compiled dispatch
        amortizes that overhead ``chunk``× with FULL metric fidelity: the
        scan stacks per-step (loss, recon, kld, kld_weight, grad_norm)
        and the caller logs them after each chunk lands.

        Yields ``(state, metrics)`` per chunk; ``metrics`` is a float32
        [n_steps, 5] device array (materialize with np.asarray — that is
        the host sync point).
        """
        if not self.train:
            raise ValueError("epoch_scan is the training path; eval uses epoch()")
        order_dev, masks_dev = self._epoch_planes(epoch)
        ekey = epoch_key(self.seed, epoch)
        run_chunk = self._chunk_program(getattr(raw_step, "raw_step_fn", raw_step))
        nb = self.num_batches
        for start in range(0, nb, chunk):
            n_steps = min(chunk, nb - start)
            state, ys = run_chunk(
                state, self._images, self._labels, order_dev, masks_dev,
                jnp.int32(start), ekey, n_steps=n_steps,
            )
            yield state, ys


# Corpora at or under this many bytes ride device-resident under
# placement="auto"; larger ones stream through the host loaders.
# 2 GiB default leaves most of a 16 GB-HBM chip for the model; override
# with MIDI_VAE_DEVICE_DATA_BUDGET_MB. The budget is CUMULATIVE across
# live DeviceResidentLoaders (train + val + test all count against it);
# released/garbage-collected loaders give their bytes back.
def _device_data_budget() -> int:
    import os

    return int(os.environ.get("MIDI_VAE_DEVICE_DATA_BUDGET_MB", "2048")) * (1 << 20)


_resident_loaders: "weakref.WeakSet" = weakref.WeakSet()


def _resident_nbytes() -> int:
    return sum(ldr.corpus_nbytes for ldr in _resident_loaders)


def _corpus_nbytes(dataset) -> int:
    if getattr(dataset, "is_rrd_stream", False):
        from midi_vae_tpu.native.rrd import read_rrd

        images, _ = read_rrd(dataset.path, mmap=True)
        return int(len(dataset) * int(np.prod(images.shape[1:])))
    return int(dataset.images.nbytes)


def _materialize(dataset) -> ArrayDataset:
    """RRD stream → in-memory ArrayDataset (rows for this split only)."""
    if not getattr(dataset, "is_rrd_stream", False):
        return dataset
    from midi_vae_tpu.native.rrd import read_rrd

    images, labels = read_rrd(dataset.path, mmap=True)
    return ArrayDataset(
        images=np.ascontiguousarray(images[dataset.indices]),
        labels=np.asarray(labels[dataset.indices]),
        name=dataset.name,
        transform=dataset.transform,
    )


def make_loader(
    dataset,
    batch_size: int,
    *,
    train: bool,
    seed: int = 0,
    sharding: Optional[jax.sharding.Sharding] = None,
    prefetch: int = 2,
    placement: str = "host",
):
    """Route a dataset to the right loader.

    ``placement``:
    - ``"host"`` — the host-fed paths: RRD streams → the native C++
      threaded loader, in-memory arrays → :class:`DeviceLoader`.
    - ``"device"`` — force :class:`DeviceResidentLoader` (corpus uploaded
      to HBM once). Works multi-process too (global arrays from identical
      process-local data; needs a NamedSharding over the global mesh).
    - ``"auto"`` — device-resident when the corpus fits the HBM data
      budget AND the run is single-process; pods default to the host
      loaders (local PCIe overlaps compute — opt in with ``device``).
    """
    if placement not in ("host", "device", "auto"):
        raise ValueError(f"unknown placement: {placement!r} (host|device|auto)")
    if placement != "host":
        multiproc = jax.process_count() > 1
        if placement == "device":
            return DeviceResidentLoader(
                _materialize(dataset), batch_size, train=train, seed=seed,
                sharding=sharding, prefetch=prefetch,
            )
        if not multiproc:
            nbytes = _corpus_nbytes(dataset)
            resident = _resident_nbytes()
            if nbytes + resident <= _device_data_budget():
                return DeviceResidentLoader(
                    _materialize(dataset), batch_size, train=train, seed=seed,
                    sharding=sharding, prefetch=prefetch,
                )
            print(
                f"data placement auto: corpus {nbytes / 2**20:.0f} MiB exceeds the "
                f"{_device_data_budget() / 2**20:.0f} MiB device budget "
                f"({resident / 2**20:.0f} MiB already resident); host-fed path"
            )
    if getattr(dataset, "is_rrd_stream", False):
        from midi_vae_tpu.native.rrd import native_available

        if native_available():
            return NativeDeviceLoader(
                dataset, batch_size, train=train, seed=seed, sharding=sharding, prefetch=prefetch
            )
        # no toolchain: degrade to mmap-backed python batching
        dataset = _materialize(dataset)
    return DeviceLoader(dataset, batch_size, train=train, seed=seed, sharding=sharding, prefetch=prefetch)


@jax.jit
def _scale_only(x: jax.Array) -> jax.Array:
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def _scalar_sharding(sharding: jax.sharding.Sharding):
    """Derive a rank-1 sharding (batch axis only) from the image sharding."""
    if isinstance(sharding, jax.sharding.NamedSharding):
        batch_axis = sharding.spec[0] if len(sharding.spec) else None
        return jax.sharding.NamedSharding(sharding.mesh, jax.sharding.PartitionSpec(batch_axis))
    return sharding

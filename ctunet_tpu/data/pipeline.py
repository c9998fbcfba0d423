"""Host data pipeline: threaded decode prefetch + device transfer overlap.

The reference overlaps NIfTI decode + augmentation with GPU compute via
DataLoader worker *processes* and pinned memory (``Model.py:179-186,198``).
Here augmentation is on device, so the host side only decodes NIfTI; a
thread pool prefetches decoded batches and ``device_put`` runs ahead of
consumption (double buffering), keeping the TPU fed without subprocess
machinery.

Sampling parity: training draws WITH replacement, num_samples = len(dataset)
(``Model.py:175-177``, quirk Q4).
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np


class HostLoader:
    """Iterable over batches: {'image': (B,D,H,W) f32, ...} + filepaths."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = True,
        replacement: bool = True,
        n_workers: int = 2,
        seed: int = 0,
        drop_remainder: bool = False,
        process_id: int = 0,
        num_processes: int = 1,
    ):
        """``batch_size`` is the GLOBAL batch. With ``num_processes > 1``
        (multi-host training, ``parallel/distributed.py``) every process
        generates the SAME epoch index stream (shared ``seed``) and loads
        only its rank's slice of each batch — process-rank data sharding;
        ``parallel.distributed.put_global`` reassembles the global array.
        Requires ``batch_size % num_processes == 0``; uneven tail batches
        are skipped in that mode."""
        self.dataset = dataset
        self.batch_size = max(1, int(batch_size))
        self.shuffle = shuffle
        self.replacement = replacement
        self.n_workers = max(1, int(n_workers or 1))
        self.drop_remainder = drop_remainder
        self.process_id = int(process_id)
        self.num_processes = max(1, int(num_processes))
        if self.batch_size % self.num_processes:
            raise ValueError(
                f"global batch {self.batch_size} must divide over "
                f"{self.num_processes} processes"
            )
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        if self.replacement:
            return self._rng.integers(0, n, size=n)
        return self._rng.permutation(n)

    def _collate(self, samples: List[Dict]) -> Dict:
        batch: Dict = {}
        for key in samples[0]:
            vals = [s[key] for s in samples]
            if isinstance(vals[0], np.ndarray):
                batch[key] = np.stack(vals)
            else:
                batch[key] = vals
        return batch

    def __iter__(self) -> Iterator[Dict]:
        idxs = self._epoch_indices()
        batches = [
            idxs[i : i + self.batch_size]
            for i in range(0, len(idxs), self.batch_size)
        ]
        if self.drop_remainder:
            batches = [b for b in batches if len(b) == self.batch_size]
        if self.num_processes > 1:
            # process-rank slice of each GLOBAL batch (index stream is
            # rank-invariant: same seed -> same permutation everywhere)
            per = self.batch_size // self.num_processes
            batches = [
                b[self.process_id * per: (self.process_id + 1) * per]
                for b in batches
                if len(b) == self.batch_size
            ]

        with cf.ThreadPoolExecutor(self.n_workers) as pool:
            pending = collections.deque()
            depth = self.n_workers + 1

            def submit(batch_idx):
                pending.append(
                    pool.map(self.dataset.__getitem__, batch_idx.tolist())
                )

            it = iter(batches)
            for _ in range(depth):
                b = next(it, None)
                if b is None:
                    break
                submit(b)
            while pending:
                samples = list(pending.popleft())
                b = next(it, None)
                if b is not None:
                    submit(b)
                yield self._collate(samples)


_unpack_cache: dict = {}


def put_packed_or_none(v: np.ndarray, sharding=None):
    """Upload an exactly-binary float array as PACKED BITS (1/32 of the
    f32 bytes over the host->device link), unpacked by a tiny jitted
    program on device; returns ``None`` when ``v`` is not binary (or too
    small to be worth the check) so the caller falls back to a raw
    ``device_put``. At 224x304x304 this turns an 83 MB upload into 2.6 MB.

    With a ``sharding``, the bits ride batch-sharded and the on-device
    unpack applies ``with_sharding_constraint`` to the FULL target
    sharding — any spatial resharding happens over ICI inside the jitted
    program, never through the host link.
    """
    import jax

    if not (
        v.ndim >= 2
        and np.issubdtype(v.dtype, np.floating)
        and v.size > 65536
        and np.array_equal(v, v.astype(np.bool_))
    ):
        return None
    key = (v.shape, str(v.dtype), sharding)
    if key not in _unpack_cache:
        import jax.numpy as jnp

        n = int(np.prod(v.shape[1:]))
        shape, dtype = v.shape, v.dtype

        @jax.jit
        def unpack(bits):
            m = jnp.unpackbits(bits, axis=-1, count=n)
            m = m.reshape((bits.shape[0],) + shape[1:]).astype(dtype)
            if sharding is not None:
                m = jax.lax.with_sharding_constraint(m, sharding)
            return m

        _unpack_cache[key] = unpack
    bits = np.packbits(v.astype(np.uint8).reshape(v.shape[0], -1), axis=-1)
    bs = None
    spec = getattr(sharding, "spec", None)
    if spec is not None:
        try:
            from jax.sharding import NamedSharding, PartitionSpec

            lead = spec[0] if len(spec) else None
            bs = NamedSharding(sharding.mesh, PartitionSpec(lead, None))
        except Exception:
            bs = None
    bits_dev = (
        jax.device_put(bits, bs) if bs is not None else jax.device_put(bits)
    )
    return _unpack_cache[key](bits_dev)


def device_prefetch(iterator, depth: int = 2, sharding=None,
                    pack_binary: bool = True):
    """Run ``jax.device_put`` ahead of the consumer (double buffering).

    Array leaves are transferred (optionally with a NamedSharding for
    multi-chip batches); non-array entries pass through untouched.

    ``pack_binary``: exactly-binary float volumes (the preprocessed skulls
    this framework trains on) cross the host->device link as packed bits
    via :func:`put_packed_or_none` (the host link, not the step, bounds
    full-res training otherwise). Binary-ness is verified on EVERY batch
    (a cheap two-pass compare, ~5% of the transfer time it saves) — a
    cached first-batch decision could silently corrupt a mixed dataset;
    only a first non-binary batch disables further checks for that key
    (datasets are homogeneous in practice, and the fallback is the raw
    transfer either way).
    """
    import jax

    never_binary: set = set()
    multiproc = jax.process_count() > 1

    def _put_raw(v):
        if multiproc and sharding is not None:
            # multi-host: v is this process's LOCAL shard of the global
            # batch (HostLoader rank slice) — assemble the global array
            from ..parallel.distributed import put_global

            return put_global(sharding, v)
        return (
            jax.device_put(v, sharding) if sharding is not None
            else jax.device_put(v)
        )

    def put(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                if pack_binary and k not in never_binary and not multiproc:
                    packed = put_packed_or_none(v, sharding)
                    if packed is not None:
                        out[k] = packed
                        continue
                    if (
                        v.ndim >= 2
                        and np.issubdtype(v.dtype, np.floating)
                        and v.size > 65536
                    ):
                        never_binary.add(k)
                out[k] = _put_raw(v)
            else:
                out[k] = v
        return out

    queue = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(max(1, depth)):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        nxt = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield nxt

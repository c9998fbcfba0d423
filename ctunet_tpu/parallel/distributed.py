"""Multi-host (multi-process / DCN) runtime.

The reference's parallelism ceiling is single-host ``nn.DataParallel``
(``/root/reference/ctunet/pytorch/Model.py:481-486``); its TPU-native
replacement is ``jax.distributed`` + XLA SPMD collectives over a DCN x ICI
mesh (SURVEY.md §2 parallelism table). This module supplies the DCN half:

- :func:`initialize_from_params` brings the process group up from config
  keys / environment variables (or JAX's automatic TPU-pod discovery);
- :func:`put_global` assembles a GLOBAL sharded batch from each process's
  LOCAL shard (``jax.make_array_from_process_local_data``) — after it, the
  jitted train step is the SAME program as single-host: XLA SPMD reduces
  gradients over ICI within a slice and DCN across slices;
- rank bookkeeping helpers used by ``HostLoader`` (process-rank file
  sharding) and the trainer (rank-0-only checkpoint/TB/print gating).

Config keys (INI type-prefix convention):
  ``b_distributed``          enable multi-process bring-up
  ``s_dist_coordinator``     "host:port" of process 0 (or env
                             ``CTUNET_COORDINATOR``)
  ``i_dist_num_processes``   world size (or env ``CTUNET_NUM_PROCESSES``)
  ``i_dist_process_id``      this process's rank (or env
                             ``CTUNET_PROCESS_ID``)
With ``b_distributed`` and NO explicit coordinator, JAX's automatic
environment discovery is used (TPU pod metadata / SLURM / Open MPI).

Tested end-to-end by ``tests/test_distributed.py``: a 2-process CPU
bring-up (subprocess workers, 2 virtual devices each) trains a real UNetSP
step stack on a 4-device global mesh and must match the single-process
run's loss trajectory and updated parameters exactly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import numpy as np

_initialized = False


def is_initialized() -> bool:
    return _initialized


def initialize_from_params(params: Dict[str, Any]) -> Tuple[int, int]:
    """Bring up ``jax.distributed`` when ``b_distributed`` is set.

    Returns ``(process_index, process_count)`` — ``(0, 1)`` when
    distribution is disabled. Safe to call more than once (subsequent
    calls are no-ops reporting the live topology).
    """
    global _initialized
    if not params.get("distributed"):
        return jax.process_index(), jax.process_count()
    if _initialized:
        return jax.process_index(), jax.process_count()

    coord = (
        params.get("dist_coordinator")
        or os.environ.get("CTUNET_COORDINATOR")
        or None
    )
    nproc = int(
        params.get("dist_num_processes")
        or os.environ.get("CTUNET_NUM_PROCESSES")
        or 0
    )
    pid = params.get("dist_process_id")
    if pid is None or int(pid) < 0:
        pid = int(os.environ.get("CTUNET_PROCESS_ID", -1))
    pid = int(pid)

    if coord and nproc > 1 and pid >= 0:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid
        )
    else:
        # automatic discovery: TPU pod metadata, SLURM, Open MPI, ...
        jax.distributed.initialize()
    _initialized = True
    print(
        f"jax.distributed: process {jax.process_index()} / "
        f"{jax.process_count()}, {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices"
    )
    return jax.process_index(), jax.process_count()


def put_global(sharding, local_batch: np.ndarray):
    """Assemble a global sharded array from this process's local shard.

    ``local_batch`` holds this process's ``B_global / process_count``
    items (the ``HostLoader`` rank slice); the result behaves like the
    full (B_global, ...) array inside jit, laid out per ``sharding``.
    In single-process mode this is exactly ``jax.device_put``.
    """
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def sync_compiled(fn, tag: str, timeout_ms: int = 1_800_000):
    """Barrier-synchronized lazy AOT compile of a jitted function.

    XLA's CPU Gloo collectives initialize their context lazily inside the
    FIRST executed collective, with a hard ~30 s key-value-store timeout —
    if one rank reaches that execution while another is still compiling
    (cold persistent cache, host contention), the context init deadline-
    exceeds and the step fails. In multi-process mode this wrapper
    ``lower().compile()``s on first call per input shape, then holds a
    coordination-service barrier (pure KV, no Gloo) so every rank enters
    the first collective execution together. Single-process: returns
    ``fn`` unchanged. Donation semantics are preserved by AOT compile.
    """
    if jax.process_count() == 1:
        return fn

    cache: Dict[str, Any] = {}

    def wrapper(*args):
        args = jax.tree.map(globalize, args)
        key = str(jax.tree.map(
            lambda x: (getattr(x, "shape", ()), str(getattr(x, "dtype", ""))),
            args,
        ))
        if key not in cache:
            compiled = fn.lower(*args).compile()
            from jax._src import distributed as _dist

            _dist.global_state.client.wait_at_barrier(
                f"ctunet_sync_{tag}_{len(cache)}", timeout_ms
            )
            cache[key] = compiled
        return cache[key](*args)

    return wrapper


def globalize(x):
    """Replicate a process-local value onto all devices, collective-free.

    Passing a process-local array (a host numpy array, a fresh PRNG key,
    ...) into a multi-process jitted program makes JAX ``device_put`` it
    onto a non-addressable replicated sharding, which runs a cross-process
    ``assert_equal`` — a Gloo collective over one device per process, the
    same hard-timeout rendezvous :func:`sync_compiled` exists to avoid.
    This places the value with ``make_array_from_process_local_data``
    instead (rank-local, no rendezvous); the caller guarantees every rank
    passes the same value (same seed / same step counter). Global arrays
    pass through untouched.
    """
    import numpy as np  # noqa: F811 - local to keep module import light

    if not isinstance(x, jax.Array):
        if not isinstance(x, (np.ndarray, np.generic, int, float, bool)):
            return x
        arr = np.asarray(x)
        sh = jax.NamedSharding(
            jax.sharding.Mesh(np.array(jax.devices()), ("_r",)),
            jax.sharding.PartitionSpec(),
        )
        return jax.make_array_from_process_local_data(sh, arr)
    if len(x.sharding.device_set) == jax.device_count():
        return x  # already global
    sh = jax.NamedSharding(
        jax.sharding.Mesh(np.array(jax.devices()), ("_r",)),
        jax.sharding.PartitionSpec(),
    )
    if jnp_issubdtype_prng(x.dtype):
        raw = np.asarray(jax.random.key_data(x))
        g = jax.make_array_from_process_local_data(sh, raw)
        return jax.random.wrap_key_data(g)
    return jax.make_array_from_process_local_data(sh, np.asarray(x))


def jnp_issubdtype_prng(dtype) -> bool:
    import jax.numpy as jnp

    try:
        return jnp.issubdtype(dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} must divide over "
            f"{n} processes"
        )
    return global_batch // n

"""Explicit halo exchange for depth-sharded chained-layout volumes.

The XLA-SPMD path (``pjit`` + sharding annotations) lets the compiler insert
conv halo exchanges automatically for the *flax* forward. The fused Pallas
engine's chained layout carries its halos EXPLICITLY (planes 0 and D+1 of
the flat ``(D+2, (H+2)*wpad, Cp)`` tensor, zeroed in-kernel), so sharding
one volume's depth across chips needs exactly one primitive: after every
chained kernel, refresh each shard's halo planes with the neighbor shards'
edge planes over ICI (``lax.ppermute``) — the 3D-conv analog of ring
attention's block exchange (SURVEY.md §5). Global-volume boundary shards
keep zeros (``ppermute`` delivers zeros to devices without a source), which
are exactly the SAME-conv semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def chain_halo_exchange(xc: jax.Array, axis: str, axis_size: int) -> jax.Array:
    """Refresh the halo planes of a per-shard chained tensor.

    :param xc: (Ds+2, rows, Cp) — this shard's planes, halo at [0] and [-1].
    :param axis: mesh axis name the depth is sharded over.
    :param axis_size: static number of shards along ``axis``.
    :returns: xc with plane 0 = left neighbor's last valid plane and plane
        Ds+1 = right neighbor's first valid plane (zeros at volume edges).
    """
    if axis_size <= 1:
        return xc
    fwd = [(j, j + 1) for j in range(axis_size - 1)]
    bwd = [(j + 1, j) for j in range(axis_size - 1)]
    top = jax.lax.ppermute(xc[-2], axis, fwd)   # my last valid -> right
    bot = jax.lax.ppermute(xc[1], axis, bwd)    # my first valid -> left
    return xc.at[0].set(top).at[-1].set(bot)


def make_halo_fn(axis: str, axis_size: int):
    """Partial of :func:`chain_halo_exchange` for the engine's halo hook."""
    return functools.partial(
        chain_halo_exchange, axis=axis, axis_size=axis_size
    )

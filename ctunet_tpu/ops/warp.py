"""On-device spatial augmentation: affine warps and elastic deformation.

The reference delegates these to torchio on the CPU inside its (bit-rotted —
quirk Q2) ``cranioplasty_transform`` (``ctunet/pytorch/transforms.py:
173-228``): ``RandomFlip(('S',))``, ``RandomElasticDeformation(7,
locked_borders=2, nearest)``, ``RandomAffine(scales=(0.9,1.1),
translation=(10,10,15), degrees=15, nearest)``. Here they are jittable XLA:
a coordinate-grid gather (``jax.scipy.ndimage.map_coordinates``) for the
affine, and a coarse control-point displacement field upsampled with
``jax.image.resize`` for the elastic warp — both fused into the training
step like the rest of the synthesis pipeline.

``cranioplasty_transform`` composes the full documented-intent augmentation
chain for the single-output shape-prior problem.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .preprocess import erode_dilate
from .synthesis import salt_and_pepper, skull_random_hole

Array = jax.Array


def _identity_grid(shape) -> Array:
    """(3, D, H, W) voxel-coordinate grid."""
    return jnp.stack(
        [
            jax.lax.broadcasted_iota(jnp.float32, shape, d)
            for d in range(3)
        ]
    )


def _sample(volume: Array, coords: Array, order: int = 0) -> Array:
    """Gather ``volume`` at (3, D, H, W) coordinates (nearest or trilinear)."""
    return jax.scipy.ndimage.map_coordinates(
        volume, [coords[0], coords[1], coords[2]], order=order, mode="constant",
        cval=0.0,
    )


def affine_warp(
    volume: Array, matrix: Array, translation: Array, order: int = 0
) -> Array:
    """Warp by an output->input affine around the volume center.

    ``in_coord = M @ (out_coord - c) + c - t``.
    """
    shape = volume.shape
    grid = _identity_grid(shape).reshape(3, -1)
    center = (jnp.asarray(shape, jnp.float32) - 1.0)[:, None] / 2.0
    src = matrix @ (grid - center) + center - translation[:, None]
    return _sample(volume, src.reshape(3, *shape), order)


def _rotation_matrix(angles: Array) -> Array:
    """Composite 3D rotation from per-axis angles (radians)."""
    az, ay, ax = angles[0], angles[1], angles[2]
    cz, sz = jnp.cos(az), jnp.sin(az)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    rz = jnp.array([[1, 0, 0], [0, cz, -sz], [0, sz, cz]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = jnp.array([[cx, -sx, 0], [sx, cx, 0], [0, 0, 1]])
    return rz @ ry @ rx


def random_affine(
    key: jax.Array,
    volume: Array,
    scales: Tuple[float, float] = (0.9, 1.1),
    translation: Tuple[float, float, float] = (10.0, 10.0, 15.0),
    degrees: float = 15.0,
    p: float = 0.5,
) -> Array:
    """Random zoom/shift/rotation (torchio RandomAffine parameters as used
    at ``transforms.py:203-206``), nearest interpolation, probability p."""
    k_coin, k_s, k_t, k_r = jax.random.split(key, 4)
    scale = jax.random.uniform(
        k_s, (3,), minval=scales[0], maxval=scales[1]
    )
    t_max = jnp.asarray(translation, jnp.float32)
    trans = jax.random.uniform(k_t, (3,), minval=-1.0, maxval=1.0) * t_max
    rad = jnp.deg2rad(degrees)
    angles = jax.random.uniform(k_r, (3,), minval=-rad, maxval=rad)
    # Output->input mapping uses the inverse: R^-1 @ diag(1/scale).
    matrix = _rotation_matrix(-angles) @ jnp.diag(1.0 / scale)
    warped = affine_warp(volume, matrix, trans, order=0)
    coin = jax.random.uniform(k_coin, ())
    return jnp.where(coin <= p, warped, volume)


def random_elastic(
    key: jax.Array,
    volume: Array,
    num_control_points: int = 7,
    max_displacement: float = 7.5,
    locked_borders: int = 2,
    p: float = 0.5,
) -> Array:
    """Random elastic deformation (torchio RandomElasticDeformation
    parameters as used at ``transforms.py:198-200``): a coarse per-axis
    displacement grid, borders locked, trilinearly upsampled to a dense
    field; nearest-sampled warp with probability p."""
    k_coin, k_d = jax.random.split(key)
    shape = volume.shape
    n = num_control_points
    disp = jax.random.uniform(
        k_d, (3, n, n, n), minval=-max_displacement, maxval=max_displacement
    )
    if locked_borders > 0:
        lb = locked_borders
        mask = jnp.zeros((n, n, n)).at[lb:-lb, lb:-lb, lb:-lb].set(1.0)
        disp = disp * mask[None]
    field = jax.image.resize(disp, (3, *shape), method="trilinear")
    coords = _identity_grid(shape) + field
    warped = _sample(volume, coords, order=0)
    coin = jax.random.uniform(k_coin, ())
    return jnp.where(coin <= p, warped, volume)


def random_flip_s(key: jax.Array, volume: Array, p: float = 0.5) -> Array:
    """Flip along the S (first/z) axis with probability p (the reference's
    ``tio.RandomFlip(('S',), .5)``, ``transforms.py:195``)."""
    coin = jax.random.uniform(key, ())
    return jnp.where(coin <= p, jnp.flip(volume, 0), volume)


@partial(jax.jit, static_argnames=())
def cranioplasty_transform(key: jax.Array, volume: Array):
    """Full augmentation chain for flap reconstruction (documented intent of
    the reference's bit-rotted ``cranioplasty_transform``,
    ``transforms.py:173-228``): erode/dilate(p=.3) -> S-flip(p=.5) ->
    elastic(p=.5) -> affine(p=.5) -> hole(p=.9) -> salt&pepper(p=1, .05).

    Returns ``(noisy broken skull, (full skull, flap))`` float32 volumes.
    """
    keys = jax.random.split(key, 6)
    full = (volume > 0).astype(jnp.float32)
    full = erode_dilate(keys[0], full, p=0.3)
    full = random_flip_s(keys[1], full, p=0.5)
    full = random_elastic(keys[2], full, p=0.5)
    full = random_affine(keys[3], full, p=0.5)
    full = (full > 0.5).astype(jnp.float32)
    broken, flap = skull_random_hole(keys[4], full, p=0.9)
    broken = salt_and_pepper(keys[5], broken, p=1.0, noise_density=0.05)
    return broken, (full, flap)

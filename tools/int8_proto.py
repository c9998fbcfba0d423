#!/usr/bin/env python
"""Prototype: int8 vs bf16 chain-conv kernel throughput on one TPU chip.

Decision gate for an int8 serving engine: the v5e MXU does 394 int8 TOPS
vs 197 bf16 TFLOP/s, so the packed-tap conv (MXU-bound at full res,
BASELINE.md) should run ~2x faster if Mosaic's int8 dot path and the
(32, 128) tiling cooperate with the chained flat layout. Times the REAL
``ops/pallas/conv3d.conv3d_chain`` (bf16, ring-cached) against an
int8-requantizing variant of the same ring kernel, at the exact full-res
UNetSP conv shape (224x304x304, pack 16, 128->128 packed channels).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ctunet_tpu.ops.pallas import conv3d as pc  # noqa: E402

D, H, WP = 224, 304, 19
WPAD = 24
CIN_P = COUT_P = 128
ROWS = (H + 2) * WPAD


def timeit(fn, args, label, iters=20):
    out = fn(*args)
    s0 = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _ = float(jnp.sum(outs[-1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label}: {dt:.2f} ms/conv (sum={s0:.3g})")
    return dt


def main():
    print("device:", jax.devices()[0], file=sys.stderr)
    rng = np.random.default_rng(0)

    x = jnp.asarray(
        rng.random((D + 2, ROWS, CIN_P), np.float32), jnp.bfloat16
    )
    w = jnp.asarray(
        rng.standard_normal((27, CIN_P, COUT_P)).astype(np.float32) * 0.05,
        jnp.float32,
    )
    b = jnp.zeros((1, COUT_P), jnp.float32)

    bf16 = jax.jit(
        lambda x, w, b: pc.conv3d_chain(x, w, b, H, WP, relu=True)
    )
    t_bf = timeit(bf16, (x, w, b), "bf16 conv3d_chain (ring)")

    xi = jnp.asarray(rng.integers(0, 100, (D + 2, ROWS, CIN_P)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, (27, CIN_P, COUT_P)), jnp.int8)
    s = jnp.full((1, COUT_P), 1e-4, jnp.float32)

    i8 = jax.jit(
        lambda x, w, s, b: pc.conv3d_chain_q(x, w, s, b, H, WP, relu=True)
    )
    t_i8 = timeit(i8, (xi, wi, s, b), "int8 conv3d_chain_q (ring)")
    print(f"int8 speedup {t_bf / t_i8:.2f}x")


if __name__ == "__main__":
    main()

import time, functools
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ctunet_tpu.ops.pallas import conv3d as pc

rng = np.random.default_rng(0)
D, H, W, pack, cw, cout = 224, 304, 304, 16, 8, 8
wp = W // pack
xq = rng.integers(-128, 128, (D, H, wp, pack * cw)).astype(np.int8)
xc = jax.device_put(pc.to_chain(jnp.asarray(xq), pack, fill=-128))
w = rng.integers(-20, 21, (3, 3, 3, cw, cout)).astype(np.float32)
scale = (rng.random(cout) * 0.001 + 0.0005).astype(np.float32)
bias = rng.standard_normal(cout).astype(np.float32)
ps = jnp.asarray(pc.pack_bias(scale, pack))
pb = jnp.asarray(pc.pack_bias(bias, pack))
pw = jnp.asarray(pc.pack_weights(w, pack).astype(np.int8))
N = 10

def run_q(ntaps, h_tile):
    """Replicate conv3d_chain_q's pallas_call with a truncated tap list."""
    dp2, rows, cin_p = xc.shape
    d = dp2 - 2
    wpad = rows // (H + 2)
    cout_p = pw.shape[2]
    ht = h_tile
    n_h = H // ht
    rout = ht * wpad
    dma_rows = (ht + 2) * wpad
    taps = tuple((dz, dy * wpad + t + 7)
                 for dz in range(3) for dy in range(3) for t in range(3))[:ntaps]
    kern = functools.partial(
        pc._chain_kernel_ring_q, taps=taps, rout=rout, dma_rows=dma_rows,
        relu=True, wp=wp, wpad=wpad, ht=ht, n_h=n_h, hh=H, d=d, zp=True, gh=0)
    def one(x):
        return pl.pallas_call(
            kern, grid=(n_h, d),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + [pl.BlockSpec(memory_space=pltpu.VMEM)]*3,
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((dp2, rows, cout_p), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((4, dma_rows + 16, cin_p), jnp.int8),
                pltpu.VMEM((2, rout, cout_p), jnp.int32),
                pltpu.VMEM((2, rout, cout_p), jnp.int8),
                pltpu.VMEM((max(rout, 2 * wpad), cout_p), jnp.int8),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        )(x, pw, ps, pb)
    @jax.jit
    def f(x):
        for _ in range(N):
            x = one(x)
        return jnp.sum(x[x.shape[0]//2, :64].astype(jnp.int32)), x
    s, _ = f(xc); int(s)
    t0 = time.perf_counter()
    outs = [f(xc)[0] for _ in range(8)]
    _ = [int(o) for o in outs]
    dt = (time.perf_counter() - t0) / 8 / N
    print(f"ntaps={ntaps:2d} ht={h_tile:3d}: {dt*1000:.3f} ms/conv", flush=True)

run_q(27, 152)
run_q(27, 76)
run_q(13, 152)
run_q(5, 152)
run_q(1, 152)

import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from ctunet_tpu.ops.pallas import conv3d as pc

rng = np.random.default_rng(0)
D, H, W, pack, cw = 224, 304, 304, 16, 8
wp = W // pack
xq = rng.integers(-128, 128, (D, H, wp, pack * cw)).astype(np.int8)
xc = jax.device_put(pc.to_chain(jnp.asarray(xq), pack, fill=-128))
nbytes = xc.size
print(f"chain array: {xc.shape} = {nbytes/1e6:.1f} MB")
N = 20

@jax.jit
def passes(x):
    # N dependent full passes; x >> 7 is data-dependent so XLA cannot
    # collapse the chain. Each pass reads+writes the whole array once.
    for _ in range(N):
        x = x + (x >> 7)
    return jnp.sum(x[:2].astype(jnp.int32)), x

def timeit(f, label, rw_bytes, iters=8):
    s, _ = f(xc); int(s)
    t0 = time.perf_counter()
    outs = [f(xc)[0] for _ in range(iters)]
    _ = [int(o) for o in outs]
    dt = (time.perf_counter() - t0) / iters / N
    print(f"{label}: {dt*1000:.3f} ms/pass -> {rw_bytes/dt/1e9:.0f} GB/s")

timeit(passes, "int8 xla 1-pass (R+W 2x212MB)", 2 * nbytes)

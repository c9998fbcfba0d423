import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
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
wm, wc = pc.pack_weights_split(w, pack)
wm = jnp.asarray(wm.astype(np.int8)); wc = jnp.asarray(wc.astype(np.int8))
ws = jnp.asarray(pc.pack_weights_stacked(w, pack).astype(np.int8))
N = 20

def chained(op):
    @jax.jit
    def f(x):
        for _ in range(N):
            x = op(x)
        return jnp.sum(x[x.shape[0]//2, :64].astype(jnp.int32)), x
    return f

full = chained(lambda x: pc.conv3d_chain_q(x, pw, ps, pb, H, wp, zp=True))
split = chained(lambda x: pc.conv3d_chain_split(x, wm, wc, pb, H, wp, pack, cw, scale=ps, zp=True))
v3 = chained(lambda x: pc.conv3d_chain_v3(x, ws, pb, H, wp, scale=ps, zp=True))

def timeit(fn, label, iters=10):
    s, _ = fn(xc); int(s)
    t0 = time.perf_counter()
    outs = [fn(xc)[0] for _ in range(iters)]
    _ = [int(o) for o in outs]
    dt = (time.perf_counter() - t0) / iters / N
    print(f"{label}: {dt*1000:.3f} ms/conv")
    return int(s)

s1 = timeit(full, "int8 27-tap   ")
s2 = timeit(split, "int8 split12+6")
s3 = timeit(v3, "int8 v3 dy-dma")
print("equal:", s1 == s2 == s3)

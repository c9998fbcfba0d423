"""MFU formulation probes at the HEADLINE level-0 shape (224x304x304,
i_size=7 -> cw=8 padded channels), int8 split-tap chain conv.

VERDICT r4 item 6: the 512-config pack-32 negative does not transfer to
the 304 config — i_size=4 channel counts (5,9,...) round a pack-32
operand up to two 128-lane blocks at 60% padding, while i_size=7's
level-0 cw=8 gives 32*8 = 256 lanes with ZERO padding. Separately,
serving is volumes/sec, so filling the contraction with a SECOND
volume's real channels is fair game. Four formulations, same math:

  base      pack16 x cw8  = 128 lanes, W=304 (wp 19, wpad 24)   1 vol
  pack32    pack32 x cw8  = 256 lanes, W padded to 320 (wp 10,
            wpad 16) — per-volume cost includes the +5.3% voxels 1 vol
  twovol256 pack16 x cw16 = 256 lanes (two volumes' channels,
            block-diagonal weights), W=304                      2 vols
  twovol128 pack8  x cw16 = 128 lanes, W=304 (wp 38, wpad 40)   2 vols
            — 20 tile-rows/plane/volume vs base's 24: the only
            formulation that cuts tile-row units per volume
            without leaving the one-lane-block regime

Each prints ms/conv/VOLUME over an N=20 chained loop; kernel-rejected
formulations print the error (a recorded negative, like the r3
split-tap table). Correctness: a separate single-conv call checks each
formulation's per-volume checksum against base over the unpadded
canvas (block-diagonal weights keep channel groups independent;
checksums stay on device — no large D2H over the axon tunnel).
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from ctunet_tpu.ops.pallas import conv3d as pc

rng = np.random.default_rng(0)
D, H, W = 224, 304, 304
CW, COUT = 8, 8
N = 20  # chained convs per timed call (amortizes dispatch)

vol = rng.integers(-128, 128, (D, H, W, CW)).astype(np.int8)
vol2 = rng.integers(-128, 128, (D, H, W, CW)).astype(np.int8)
w = rng.integers(-20, 21, (3, 3, 3, CW, COUT)).astype(np.float32)
scale = (rng.random(COUT) * 0.001 + 0.0005).astype(np.float32)
bias = rng.standard_normal(COUT).astype(np.float32)

# block-diagonal two-volume weights: vol0's channels -> outs [0:8],
# vol1's -> outs [8:16]
w2 = np.zeros((3, 3, 3, 2 * CW, 2 * COUT), np.float32)
w2[..., :CW, :COUT] = w
w2[..., CW:, COUT:] = w
scale2 = np.concatenate([scale, scale])
bias2 = np.concatenate([bias, bias])


def pack_vol(v, pack):
    d, hh, ww, c = v.shape
    return v.reshape(d, hh, ww // pack, pack * c)


def build_case(pack, vols, ww):
    cw = CW * len(vols)
    cout = COUT * len(vols)
    wk, sk, bk = ((w, scale, bias) if len(vols) == 1
                  else (w2, scale2, bias2))
    stacked = np.concatenate(
        [np.pad(v, ((0, 0), (0, 0), (0, ww - W), (0, 0)),
                constant_values=-128) for v in vols], axis=-1)
    xq = pack_vol(stacked, pack)
    xc = jax.device_put(pc.to_chain(jnp.asarray(xq), pack, fill=-128))
    wm, wc_ = pc.pack_weights_split(wk, pack)
    wm = jnp.asarray(wm.astype(np.int8))
    wc_ = jnp.asarray(wc_.astype(np.int8))
    ps = jnp.asarray(pc.pack_bias(sk, pack))
    pb = jnp.asarray(pc.pack_bias(bk, pack))
    wp = ww // pack

    def conv(x):
        return pc.conv3d_chain_split(
            x, wm, wc_, pb, H, wp, pack, cw, scale=ps, zp=True)

    @jax.jit
    def f_timed(x):
        for _ in range(N):
            x = conv(x)
        # cheap device-side sync scalar
        return jnp.sum(x[x.shape[0] // 2, :64].astype(jnp.int32)), x

    @jax.jit
    def f_check(x):
        # ONE conv, unpack, per-volume checksum over the unpadded canvas
        # (after >1 chained convs a padded-W canvas diverges at the W
        # boundary: pad columns hold conv outputs, not halo zeros)
        y = conv(x)
        std = pc.from_chain(y, H, wp, pack * cout)
        yd = std.reshape(std.shape[0], std.shape[1], wp * pack, cout)
        yd = yd[:, :, :W, :]
        return [
            jnp.sum(yd[..., i * COUT:(i + 1) * COUT].astype(jnp.int64))
            for i in range(len(vols))
        ]

    return f_timed, f_check, xc, len(vols)


def timeit(label, pack, vols, ww, iters=10):
    try:
        f_timed, f_check, xc, nv = build_case(pack, vols, ww)
        checks = [int(s) for s in f_check(xc)]
        s0, _ = f_timed(xc)
        int(s0)  # warm + force
        t0 = time.perf_counter()
        outs = [f_timed(xc)[0] for _ in range(iters)]
        _ = [int(o) for o in outs]
        dt = (time.perf_counter() - t0) / iters / N / nv
        print(f"{label:<10s} pack={pack:<3d} "
              f"lanes={pack * CW * len(vols):<4d} W={ww}: "
              f"{dt * 1000:.3f} ms/conv/volume  checks={checks}",
              flush=True)
        return checks[0]
    except Exception as e:
        print(f"{label:<10s} pack={pack}: REJECTED "
              f"{type(e).__name__}: {e}", flush=True)
        return None


s_base = timeit("base", 16, [vol], 304)
s_p32 = timeit("pack32", 32, [vol], 320)
s_2v256 = timeit("twovol256", 16, [vol, vol2], 304)
s_2v128 = timeit("twovol128", 8, [vol, vol2], 304)
agree = [s for s in (s_p32, s_2v256, s_2v128) if s is not None]
print("vol-0 checksum agreement vs base:",
      all(s == s_base for s in agree), flush=True)

#!/usr/bin/env python
"""Attribute the int8 engine's hot HLO ops to source (VERDICT r1 item 5).

BENCH_r01.json's profile showed two unattributed ops (``predict.38/39``,
13.8 ms = 32% of int8 device time). This tool compiles the int8 predict,
profiles N iterations, and prints (a) the top self-time ops from the
profile and (b) each compiled-HLO computation whose name matches,
with its ``metadata.op_name``/``source_file`` — the same technique used
for the train step (BASELINE.md round 4).

Usage: PYTHONPATH=. python tools/attr_int8.py [--tail 1]
           [--shape 224,304,304] [--profile-dir /tmp/int8prof]
"""

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    shape = (224, 304, 304)
    if "--shape" in sys.argv:
        shape = tuple(
            int(v) for v in sys.argv[sys.argv.index("--shape") + 1].split(",")
        )
    tail = 0
    if "--tail" in sys.argv:
        tail = int(sys.argv[sys.argv.index("--tail") + 1])
    prof_dir = "/tmp/int8prof"
    if "--profile-dir" in sys.argv:
        prof_dir = sys.argv[sys.argv.index("--profile-dir") + 1]

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from ctunet_tpu import engine_q
    from ctunet_tpu.models import build_model

    model = build_model("UNetSP", compute_dtype="bfloat16")
    x0 = jnp.zeros((1, 32, 32, 32, 2), jnp.bfloat16)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), x0, False
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.random((1, *shape, 2)) > 0.5).astype(np.float32), jnp.bfloat16
    )
    fwd = engine_q.build_predict_q(
        "UNetSP", variables, x[0], bf16_tail=tail, jit=False
    )

    @jax.jit
    def predict(x):
        out = fwd(x[0])
        return sum(jnp.sum(o.astype(jnp.float32))
                   for o in jax.tree.leaves(out))

    # compiled HLO with metadata for name -> source mapping
    compiled = predict.lower(x).compile()
    hlo = compiled.as_text()
    print(f"compiled HLO: {len(hlo.splitlines())} lines", flush=True)

    float(predict(x))  # warm
    from jax.profiler import trace

    with trace(prof_dir):
        for _ in range(3):
            float(predict(x))
    print(f"profile written to {prof_dir}", flush=True)

    # index HLO ops by name -> (metadata op_name, source line). Parse
    # LINE BY LINE with anchored regexes — a lazy .*? scan over the whole
    # dump backtracks catastrophically on multi-MB single-line constants.
    meta = {}
    for ln in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=", ln)
        if not m or "metadata={" not in ln:
            continue
        md = ln.split("metadata={", 1)[1]
        md = md.split("}", 1)[0]
        op = re.search(r'op_name="([^"]*)"', md)
        src = re.search(r'source_file="([^"]*)"', md)
        line = re.search(r"source_line=(\d+)", md)
        meta[m.group(1)] = (
            (op.group(1) if op else ""),
            f"{src.group(1) if src else ''}:{line.group(1) if line else ''}",
        )

    # per-op durations from the Chrome trace JSON the profiler writes
    import collections
    import glob
    import gzip
    import json

    ts = sorted(glob.glob(
        os.path.join(prof_dir, "plugins/profile/*/*.trace.json.gz")
    ))
    if not ts:
        print("no trace.json found; inspect the profile dir manually")
        return
    with gzip.open(ts[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    tot = collections.defaultdict(float)
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev:
            tot[ev.get("name", "?")] += float(ev["dur"])
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
    print(f"top ops over 3 iterations (us total; /3 for per-volume):")
    for name, dur in top:
        base = name.split("/")[-1]
        op, src = meta.get(base, meta.get(name, ("", "")))
        print(f"  {dur/3:9.0f} us  {name[:46]:<46s} {op[:50]:<50s} {src}")


if __name__ == "__main__":
    main()

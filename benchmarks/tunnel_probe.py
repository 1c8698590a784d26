"""Axon-tunnel cost anatomy probe (round 5).

Measures the host<->device primitives the driver's per-chunk loop is built
from, so the fetch/untracked wall redesign (VERDICT round-4 #1) targets the
real cost, not a guess:

  1. h2d put: ``jnp.asarray(scalar)`` / small vector — is it synchronous?
  2. d2h fetch RTT: ``np.asarray`` of a tiny device array.
  3. dispatch asynchrony: a jit'd ~1s compute — call-return wall vs
     ``block_until_ready`` wall vs first-fetch wall (CLAUDE.md says
     block_until_ready under-reports through the tunnel).
  4. fused vs separate fetches: N small arrays via N ``np.asarray`` calls
     vs one ``jax.device_get`` of the tuple.
  5. overlap: fetch of an already-materialized array while a dispatch is
     in flight (does the relay serialize it behind the execute?).

Prints one JSON line with every number.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    out = {"backend": jax.default_backend()}
    log(f"backend: {jax.default_backend()}")

    # -- 1. h2d puts -------------------------------------------------------
    # warm
    jnp.asarray(0.5, jnp.float32).block_until_ready()
    t0 = time.perf_counter()
    xs = [jnp.asarray(float(i), jnp.float32) for i in range(50)]
    t_put_async = time.perf_counter() - t0
    jax.block_until_ready(xs)
    t_put_drain = time.perf_counter() - t0
    out["put_scalar_ms_call"] = round(t_put_async / 50 * 1e3, 3)
    out["put_scalar_ms_drained"] = round(t_put_drain / 50 * 1e3, 3)
    log(f"h2d scalar put: {out['put_scalar_ms_call']}ms/call async, "
        f"{out['put_scalar_ms_drained']}ms/call drained")

    # -- 2. d2h fetch RTT --------------------------------------------------
    # JAX caches the host copy after the first materialization of an
    # array, so each iteration must fetch a DISTINCT, never-fetched
    # buffer to measure the real tunnel round-trip
    smalls = [jnp.full((4,), float(i)) for i in range(50)]
    jax.block_until_ready(smalls)
    np.asarray(jnp.ones((4,)))  # warm the fetch path once
    t0 = time.perf_counter()
    for s in smalls:
        np.asarray(s)
    rtt = (time.perf_counter() - t0) / 50
    out["fetch_small_ms"] = round(rtt * 1e3, 3)
    log(f"d2h small fetch: {out['fetch_small_ms']}ms")

    # medium fetch (1.3MB, the per-chunk sample-row scale)
    meds = [jnp.full((5, 512, 128), float(i)) for i in range(5)]
    jax.block_until_ready(meds)
    t0 = time.perf_counter()
    for m in meds:
        np.asarray(m)
    out["fetch_1p3mb_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 1)
    log(f"d2h 1.3MB fetch: {out['fetch_1p3mb_ms']}ms")

    # -- 3. dispatch asynchrony -------------------------------------------
    @jax.jit
    def burn(x, n):
        def body(_, acc):
            return acc @ x
        return jax.lax.fori_loop(0, n, body, x)[0, 0]

    x = jnp.eye(1024, dtype=jnp.float32) * 0.999
    n_iter = jnp.asarray(2000, jnp.int32)
    r = burn(x, n_iter)  # compile
    float(r)
    t0 = time.perf_counter()
    r = burn(x, n_iter)
    t_call = time.perf_counter() - t0
    r.block_until_ready()
    t_block = time.perf_counter() - t0
    v = float(np.asarray(r))
    t_fetch = time.perf_counter() - t0
    out["dispatch_call_ms"] = round(t_call * 1e3, 1)
    out["dispatch_block_ms"] = round(t_block * 1e3, 1)
    out["dispatch_fetch_ms"] = round(t_fetch * 1e3, 1)
    log(f"~matmul-loop dispatch: call returns {out['dispatch_call_ms']}ms, "
        f"block_until_ready {out['dispatch_block_ms']}ms, "
        f"fetch {out['dispatch_fetch_ms']}ms (value {v:.3g})")

    # -- 4. fused vs separate fetches (fresh buffers each trial) ----------
    def fresh_six(tag):
        a = [jnp.full((10, 512), float(i) + tag) for i in range(6)]
        jax.block_until_ready(a)
        return a

    t_sep = t_fused = 0.0
    for trial in range(10):
        arrs = fresh_six(100 + trial * 10)
        t0 = time.perf_counter()
        for a in arrs:
            np.asarray(a)
        t_sep += time.perf_counter() - t0
        arrs = fresh_six(1000 + trial * 10)
        t0 = time.perf_counter()
        jax.device_get(tuple(arrs))
        t_fused += time.perf_counter() - t0
    out["fetch6_separate_ms"] = round(t_sep / 10 * 1e3, 1)
    out["fetch6_device_get_ms"] = round(t_fused / 10 * 1e3, 1)
    log(f"6-array fetch: separate {out['fetch6_separate_ms']}ms, "
        f"one device_get {out['fetch6_device_get_ms']}ms")

    # -- 5. overlap: fetch behind an in-flight dispatch --------------------
    done = jnp.full((5, 512, 128), 2.0)
    done.block_until_ready()
    t0 = time.perf_counter()
    r = burn(x, n_iter)          # ~50ms in flight
    t_disp = time.perf_counter() - t0
    got = np.asarray(done)       # materialized but never fetched
    t_overlap_fetch = time.perf_counter() - t0 - t_disp
    float(np.asarray(r))
    t_total = time.perf_counter() - t0
    out["overlap_fetch_ms"] = round(t_overlap_fetch * 1e3, 1)
    out["overlap_total_ms"] = round(t_total * 1e3, 1)
    log(f"overlap: fetch-behind-dispatch {out['overlap_fetch_ms']}ms, "
        f"total {out['overlap_total_ms']}ms (got {got[0, 0, 0]:.1f})")

    # -- 6. eager device-side gather dispatch cost -------------------------
    big = jnp.ones((50, 2048, 251), jnp.float32)
    big.block_until_ready()
    idx = jnp.asarray([1, 3, 5, 7, 9])
    sl = big[idx, :512]
    sl.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        sl = big[idx, :512]
    t_gather_async = (time.perf_counter() - t0) / 20
    jax.block_until_ready(sl)
    out["gather_dispatch_ms"] = round(t_gather_async * 1e3, 2)
    log(f"eager gather dispatch: {out['gather_dispatch_ms']}ms/call")

    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Wave-front straggler-loss probe (VERDICT round-4 #7).

In grouped-adaptation mode every chain integrates its own group's L but
the batched wave front runs to the LONGEST group's L with finished
chains mask-frozen (sampler/hmc.py; ops/fused_mlp.py runs the same
contract in-kernel). Round-4 flagship artifacts measure the resulting
straggler_efficiency at 0.80-0.83: ~17-20% of executed device work is
frozen lanes.

Whether an alternative layout can recover that loss hinges on one
question this probe answers directly: **does the per-leapfrog-step
device cost actually scale with the chain count**, or is it dominated
by per-step fixed overhead at the flagship's tiny data size?

  - If cost(C chains) ~ C: running the G groups sequentially (each a
    C/G-chain uniform-L call) costs sum(L_g)/G-blocks instead of
    max(L_g) x G-blocks -> saves exactly the straggler loss.
  - If cost is flat in C (fixed overhead / lane underfill): sequential
    groups cost sum(L_g) x flat >= max(L_g) x flat -> strictly WORSE,
    and the masked wave front is already the right design.

Measures, on the product path (fused Pallas trajectory kernel when it
engages, same as bench.py):

  1. warm chunk wall at C=512, uniform L=200 (the straggler-paid cost)
  2. warm chunk wall at C=512, grouped L=(100,150,180,200) per 128-chain
     group (must match #1 — the mask-frozen wave front pays max L)
  3. warm chunk wall at C=128, uniform L=200 (the per-group building
     block of a sequential-groups design)
  4. warm chunk wall at C=128 for each L in (100,150,180,200) summed
     (what sequential dispatch of the four groups would actually cost)

Decision rule: sequential wins iff #4 < #1 by >= 5%. Prints one JSON
line with every number.
"""

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as graft
    from tensorbnn_tpu.ops.fused_hyper import \
        try_build_fused_hyper_trajectory
    from tensorbnn_tpu.ops.fused_mlp import try_build_fused_trajectory
    from tensorbnn_tpu.parallel.chains import (
        init_multichain_state,
        make_multichain_chunk_runner,
    )

    model, likelihood, flat, x, y = graft._flagship()
    backend = jax.default_backend()
    out = {"backend": backend}
    log(f"backend: {backend}")

    hyper_leapfrog = 30
    chunk = 10
    eps = jnp.asarray(2e-3, jnp.float32)

    def build(n_chains, per_chain):
        fused_traj = None
        fused_hyper = None
        if backend == "tpu":
            fused_traj = try_build_fused_trajectory(
                model, likelihood, flat.unravel_theta, flat.unravel_eta,
                x, y, eta_dim=flat.eta.size, block_c=min(n_chains, 64),
                record_uturn=False)
            fused_hyper = try_build_fused_hyper_trajectory(
                model, likelihood, flat.unravel_eta, flat.eta.size,
                hyper_leapfrog, block_c=min(n_chains, 64))
        return make_multichain_chunk_runner(
            model, likelihood, x, y, flat.unravel_theta,
            flat.unravel_eta, adjust_hypers=True,
            hyper_leapfrog=hyper_leapfrog, burnin=1e9,
            hyper_step_size_init=1e-3, mesh=None, donate=False,
            batched_main_traj=fused_traj, batched_hyper_traj=fused_hyper,
            per_chain_adapt=per_chain)

    def timed(run, carry, eps_arg, leap_arg, reps=5):
        # warm/compile
        c, tr = run(carry, x, y, eps_arg, leap_arg, chunk)
        float(jnp.sum(c.theta))
        t0 = time.perf_counter()
        for _ in range(reps):
            c, tr = run(c, x, y, eps_arg, leap_arg, chunk)
        float(jnp.sum(c.theta))  # device-side drain marker
        return (time.perf_counter() - t0) / reps

    group_ls = (100, 150, 180, 200)

    # -- 1 & 2: C=512 uniform vs grouped ---------------------------------
    run512u = build(512, per_chain=False)
    carry512 = init_multichain_state(flat.theta, flat.eta,
                                     jax.random.key(0), 1e-3, 512,
                                     jitter=0.01)
    t_512_uniform = timed(run512u, carry512,
                          eps, jnp.asarray(200, jnp.int32))
    out["t512_uniform_L200"] = round(t_512_uniform, 4)
    log(f"C=512 uniform L=200: {t_512_uniform:.4f}s/chunk")

    run512g = build(512, per_chain=True)
    leap_vec = jnp.asarray(np.repeat(group_ls, 128), jnp.int32)
    eps_vec = jnp.full((512,), 2e-3, jnp.float32)
    t_512_grouped = timed(run512g, carry512, eps_vec, leap_vec)
    out["t512_grouped"] = round(t_512_grouped, 4)
    log(f"C=512 grouped L={group_ls}: {t_512_grouped:.4f}s/chunk "
        f"(vs uniform-max: {t_512_grouped / t_512_uniform:.3f}x)")

    # -- 3 & 4: C=128 scaling + the sequential-groups total ---------------
    run128 = build(128, per_chain=False)
    carry128 = init_multichain_state(flat.theta, flat.eta,
                                     jax.random.key(1), 1e-3, 128,
                                     jitter=0.01)
    t_128_uniform = timed(run128, carry128, eps,
                          jnp.asarray(200, jnp.int32))
    out["t128_uniform_L200"] = round(t_128_uniform, 4)
    log(f"C=128 uniform L=200: {t_128_uniform:.4f}s/chunk "
        f"(C-scaling {t_512_uniform / t_128_uniform:.2f}x for 4x chains)")

    seq_total = 0.0
    per_l = {}
    for lg in group_ls:
        t = timed(run128, carry128, eps, jnp.asarray(lg, jnp.int32),
                  reps=3)
        per_l[lg] = round(t, 4)
        seq_total += t
    out["t128_per_L"] = per_l
    out["t_sequential_groups"] = round(seq_total, 4)
    out["sequential_vs_masked"] = round(seq_total / t_512_grouped, 4)
    out["c_scaling_512_over_128"] = round(
        t_512_uniform / t_128_uniform, 3)
    out["predicted_masked_efficiency"] = round(
        float(np.mean(group_ls)) / max(group_ls), 4)
    log(f"sequential groups total: {seq_total:.4f}s/chunk -> "
        f"{out['sequential_vs_masked']:.3f}x the masked wave front "
        f"(win iff < 0.95)")

    print(json.dumps(out))


if __name__ == "__main__":
    main()

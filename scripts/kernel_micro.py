"""Micro-benchmark of the fine-block IVF scoring kernel on the real TPU.

Separates per-grid-step FIXED cost from per-candidate-visit MARGINAL
cost by sweeping (q_blocks, cb, k, P) on fixed synthetic data.  Forces
real completion by pulling a scalar reduction (axon block_until_ready
does not block; CLAUDE.md).

Usage: python scripts/kernel_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from cna_tpu import config as cna_config
    from cna_tpu.ops.ivf_pallas import score_blocks_pallas

    cna_config.warmup_transfers_async()
    rng = np.random.RandomState(0)
    g, d_pad = 128, 128
    f_pad = 2048
    x4 = jnp.asarray(rng.randn(f_pad, g, d_pad).astype(np.float32))
    counts = jnp.full((f_pad,), g, jnp.int32)
    csum = jnp.arange(f_pad, dtype=jnp.int32) * g

    def run(ns, p, k, qb, cb, reps=3):
        sel = jnp.asarray(
            rng.randint(0, f_pad // qb, ns).astype(np.int32))
        probes = jnp.asarray(
            rng.randint(0, f_pad, (ns, p)).astype(np.int32))
        # warm compile
        negd, _ = score_blocks_pallas(x4, sel, probes, counts, csum, k,
                                      g=g, q_blocks=qb, cb=cb)
        float(jnp.sum(negd[:, 0, 0]))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            negd, idx = score_blocks_pallas(x4, sel, probes, counts,
                                            csum, k, g=g, q_blocks=qb,
                                            cb=cb)
            float(jnp.sum(negd[:, 0, 0]))
            ts.append(time.time() - t0)
        t = min(ts)
        steps = ns * (p // cb)
        visits = ns * qb * g * p * g
        print(f"qb={qb} cb={cb:2d} k={k:2d} ns={ns} P={p:4d}: "
              f"{t*1e3:7.1f} ms  {t/steps*1e6:6.1f} us/step  "
              f"{t/visits*1e10:.3f} e-10 s/visit", flush=True)
        return t, steps, visits

    print("# sweep P at fixed geometry (fixed-vs-marginal split):")
    for p in (64, 128, 256):
        run(64, p, 15, 4, 16)
    print("# cb sweep (DMA-count effect at same visit count):")
    for cb, p in ((8, 128), (16, 128)):
        run(64, p, 15, 4, cb)
    print("# q_blocks sweep (query-tile size):")
    for qb in (1, 2, 4):
        run(64 * (4 // qb), 128, 15, qb, 16)
    print("# k sweep (extraction passes):")
    for k in (4, 8, 15):
        run(64, 128, k, 4, 16)


if __name__ == "__main__":
    main()

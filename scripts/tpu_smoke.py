"""Real-TPU Mosaic kernel smoke test (VERDICT r3 item 8).

All Pallas unit tests run the interpreter on CPU; real-TPU lowering was
only exercised implicitly through bench runs.  This script runs each
Pallas kernel ON CHIP at small shapes, asserts against its XLA twin, and
writes a one-line JSON artifact (TPU_SMOKE.json).  Run opportunistically
under ``timeout`` (CLAUDE.md):

    timeout 600 python scripts/tpu_smoke.py
"""

import json
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

    cna_config.warmup_transfers_async()
    platform = jax.devices()[0].platform
    results = {"platform": platform, "kernels": {}, "ok": False}
    rng = np.random.RandomState(0)

    def record(name, fn):
        t0 = time.time()
        try:
            fn()
            results["kernels"][name] = {"ok": True,
                                        "s": round(time.time() - t0, 2)}
        except Exception as e:  # noqa: BLE001 — artifact must report it
            results["kernels"][name] = {"ok": False, "error": repr(e)[:300]}

    # --- exact kNN kernel vs the XLA exact search ---
    def knn_case():
        from cna_tpu.ops.knn_pallas import knn_pallas
        from cna_tpu.pp.knn import knn_search

        x = rng.randn(4096, 24).astype(np.float32)
        negd, idx = knn_pallas(x, 10)
        idx = np.asarray(idx)
        ei, _ = knn_search(x, 10, method="exact")
        recall = np.mean([len(set(idx[i]) & set(np.asarray(ei)[i])) / 10
                          for i in range(0, 4096, 7)])
        assert recall > 0.999, recall

    record("knn_pallas", knn_case)

    # --- fine-block IVF scorer vs a numpy re-computation ---
    def ivf_case():
        from cna_tpu.ops.ivf_pallas import score_blocks_pallas

        g, d_pad, f_pad, k = 128, 128, 64, 8
        x4 = rng.randn(f_pad, g, d_pad).astype(np.float32)
        counts = np.full(f_pad, g, np.int32)
        counts[-1] = 0
        csum = (np.cumsum(counts) - counts).astype(np.int32)
        sel = np.arange(8, dtype=np.int32)
        probes = rng.permutation(f_pad - 1)[:16].astype(np.int32)
        probes = np.broadcast_to(probes, (8, 16)).copy()
        negd, idx = score_blocks_pallas(
            jnp.asarray(x4), jnp.asarray(sel), jnp.asarray(probes),
            jnp.asarray(counts), jnp.asarray(csum), k, q_blocks=1)
        negd, idx = np.asarray(negd), np.asarray(idx)
        # numpy reference: exact top-k within the probed set
        cand = x4[probes[0]].reshape(-1, d_pad)          # (16*g, d)
        cand_ids = (csum[probes[0]][:, None]
                    + np.arange(g)[None, :]).reshape(-1)
        for s in range(8):
            q = x4[s]
            d2 = ((q[:, None, :] - cand[None, :, :]) ** 2).sum(-1)
            ref_ids = cand_ids[np.argsort(d2, axis=1)[:, :k]]
            got = idx[s]
            overlap = np.mean([len(set(got[r]) & set(ref_ids[r])) / k
                               for r in range(g)])
            assert overlap > 0.99, (s, overlap)
            ref_d = np.sort(d2, axis=1)[:, :k]
            # tolerance = the kernel's documented value precision:
            # neighbor IDS (checked above at 0.99 overlap) are the
            # contract; distance VALUES carry (a) ~2^-12 packed-id
            # quantization, (b) bf16-pass MXU cross terms, whose
            # cancellation error scale is |x|^2 * 2^-8 ~= 0.5 here
            # (worst at self-distances, where the pipeline clamps to 0
            # by id anyway).  Sort both sides: near-ties legitimately
            # swap order under quantization.
            atol = x4.shape[2] * 2.0 ** -7
            np.testing.assert_allclose(np.sort(-negd[s], axis=1), ref_d,
                                       rtol=1e-2, atol=atol)

    record("score_blocks_pallas", ivf_case)

    # --- banded SpMM kernel vs scipy ---
    def banded_case():
        import scipy.sparse as sp

        from cna_tpu.ops.spmm_pallas import banded_from_scipy, banded_spmm

        n = 2048
        offs = [-3, -2, -1, 1, 2, 3]
        a = sp.diags([rng.rand(n - abs(o)) for o in offs], offs,
                     format="csr")
        graph = banded_from_scipy(a)
        s = rng.randn(n, 16).astype(np.float32)
        got = np.asarray(banded_spmm(graph, jnp.asarray(s)))
        ref = a @ s
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-4)

    record("banded_spmm", banded_case)

    results["ok"] = all(v.get("ok") for v in results["kernels"].values())
    path = os.path.join(os.path.dirname(__file__), "..", "TPU_SMOKE.json")
    with open(path, "w") as f:
        json.dump(results, f)
    print(json.dumps(results))
    sys.exit(0 if results["ok"] else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the fused pallas chol+inv kernel against XLA's cholesky+solve.

The CholeskyQR2 hot path (KPBP_LINALG=gram) spends its non-matmul time in
chol(G) + triangular solve on tiny (χ×χ) matrices — exactly where XLA's
loop-heavy HLO custom calls pay fixed costs the fused VMEM kernel avoids.
Measures both at the production χ ladder; one JSON line per size + summary.

Usage: python tools/bench_chol_kernel.py [sizes...]   (default 18 32 50 128)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [18, 32, 50, 128]

    import jax

    if os.environ.get("KPBP_PROBE_PLATFORM"):  # CPU self-test of the harness
        jax.config.update("jax_platforms", os.environ["KPBP_PROBE_PLATFORM"])
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    from kagomeperiodicbp_tpu.ops.pallas_kernels import chol_inv_pallas
    from kagomeperiodicbp_tpu.utils.jaxtools import resilient_jit, to_numpy

    platform = jax.devices()[0].platform
    print(json.dumps({"platform": platform}), flush=True)

    summary = {}
    for k in sizes:
        kb = jax.random.PRNGKey(k)
        m = 4 * k  # the executor's tall side
        a = (jax.random.normal(kb, (m, k)) +
             1j * jax.random.normal(jax.random.fold_in(kb, 1), (m, k))
             ).astype(jnp.complex64)

        def xla_path(a):
            g = a.conj().T @ a + 1e-6 * jnp.eye(k, dtype=a.dtype)
            l = jnp.linalg.cholesky(g)
            qh = solve_triangular(l, a.conj().T, lower=True)
            return qh.conj().T, l.conj().T

        def pallas_path(a):
            g = a.conj().T @ a + 1e-6 * jnp.eye(k, dtype=a.dtype)
            l, w = chol_inv_pallas(g)
            return a @ w.conj().T, l.conj().T

        rec = {"k": k, "m": m}
        for name, fn in (("xla", xla_path), ("pallas", pallas_path)):
            try:
                f = resilient_jit(fn)
                q, r = f(a)                      # compile+validate
                jax.block_until_ready((q, r))
                reps = 50
                t0 = time.perf_counter()
                for _ in range(reps):
                    q, r = f(a)
                jax.block_until_ready((q, r))
                dt = (time.perf_counter() - t0) / reps
                # correctness spot check (hang-guarded transfer)
                import numpy as np

                qn = to_numpy(q)
                ortho = float(np.abs(qn.conj().T @ qn - np.eye(k)).max())
                rec[name + "_us"] = round(dt * 1e6, 1)
                rec[name + "_ortho_err"] = round(ortho, 7)
            except Exception as exc:  # noqa: BLE001
                rec[name + "_error"] = repr(exc)[:120]
        if "xla_us" in rec and "pallas_us" in rec:
            rec["speedup"] = round(rec["xla_us"] / rec["pallas_us"], 3)
            summary[k] = rec["speedup"]
        print(json.dumps(rec), flush=True)
    print(json.dumps({"summary_speedup_by_k": summary}), flush=True)


if __name__ == "__main__":
    main()

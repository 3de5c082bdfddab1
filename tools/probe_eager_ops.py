#!/usr/bin/env python
"""Which individual (eager) ops does the axon backend execute right now?

The degraded-weather eager fallback (utils/jaxtools.resilient_jit) only
helps if per-op programs run.  This probes the exact op classes the BP/ITE
path needs, real and complex, and prints one JSON line per op.

Usage: python tools/probe_eager_ops.py [size]
"""
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _T(Exception):
    pass


def _alarm(s, f):
    raise _T()


def probe(name, fn, seconds=120):
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(seconds)
    t0 = time.time()
    try:
        import jax

        out = fn()
        jax.block_until_ready(out)
        print(json.dumps({"op": name, "ok": True,
                          "s": round(time.time() - t0, 1)}), flush=True)
        return True
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"op": name, "ok": False,
                          "s": round(time.time() - t0, 1),
                          "error": repr(exc)[:120]}), flush=True)
        return False
    finally:
        signal.alarm(0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    import jax
    import jax.numpy as jnp

    print(json.dumps({"platform": jax.devices()[0].platform, "n": n}), flush=True)

    kr = jax.random.PRNGKey(0)
    xr = jax.random.normal(kr, (n, n), jnp.float32)
    xc = (xr + 1j * jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
          ).astype(jnp.complex64)
    t4 = xc.reshape(n // 4, 4, 4, n // 4)

    probe("matmul_f32", lambda: xr @ xr)
    probe("matmul_c64", lambda: xc @ xc)
    probe("einsum_c64", lambda: jnp.einsum("ab,bc->ac", xc, xc))
    probe("tensordot_c64", lambda: jnp.tensordot(t4, jnp.conj(t4), axes=([1], [2])))
    probe("qr_f32", lambda: jnp.linalg.qr(xr)[0])
    probe("qr_c64", lambda: jnp.linalg.qr(xc)[0])
    probe("svd_f32", lambda: jnp.linalg.svd(xr, full_matrices=False)[1])
    probe("svd_c64", lambda: jnp.linalg.svd(xc, full_matrices=False)[1])
    probe("eigh_c64", lambda: jnp.linalg.eigh(xc + jnp.conj(xc.T))[0])
    probe("norm_c64", lambda: jnp.linalg.norm(xc))
    probe("exp_log_chain", lambda: jnp.exp(jnp.log(jnp.abs(xc).sum())))
    probe("transfer_f32", lambda: jnp.asarray(float(jnp.real(xc[0, 0]))))

    # a medium jitted program for scale comparison (BP-sweep-shaped no, but
    # a chained contraction yes)
    def chain(a):
        for _ in range(6):
            a = (a @ a) / jnp.linalg.norm(a)
        return a

    probe("jit_chain_c64", lambda: jax.jit(chain)(xc), seconds=300)


if __name__ == "__main__":
    main()

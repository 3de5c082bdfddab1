#!/usr/bin/env python
"""Probe the axon TPU backend: tiny jitted matmul under a hard alarm.

Exit 0 = backend up and executing; exit 1 = down/hung/poisoned.
Prints one status line either way.  (CLAUDE.md: the tunnel can be fully
down for hours — always probe before committing to chip work.)
"""
import json
import os
import signal
import sys
import time


def main():
    timeout = int(os.environ.get("KPBP_PROBE_TIMEOUT", "90"))

    def _alarm(signum, frame):
        print(json.dumps({"axon": "down", "reason": f"probe exceeded {timeout}s"}))
        os._exit(1)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(timeout)
    t0 = time.time()
    try:
        import jax
        import jax.numpy as jnp

        x = jnp.ones((64, 64), jnp.float32)
        y = jax.jit(lambda a: a @ a)(x)
        jax.block_until_ready(y)
        # a second, differently-shaped program guards against a poisoned
        # single executable slipping through
        z = jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((96, 32), jnp.float32))
        jax.block_until_ready(z)
        # the poisoned state has been observed to pass tiny f32 matmul jits
        # while failing (a) multi-op complex64 programs and (b) any
        # device→host transfer — exactly what BP programs need. Gate on both
        # so the battery doesn't burn an hour of host CPU per false positive.
        c = jnp.ones((32, 32), jnp.complex64)
        w = jax.jit(lambda a: (a @ a.conj().T) + a.sum())(c)
        jax.block_until_ready(w)
        float(jnp.real(z))  # device→host transfer must round-trip
        plat = jax.devices()[0].platform
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"axon": "down", "reason": repr(exc)[:160]}))
        return 1
    signal.alarm(0)
    print(json.dumps({"axon": "up", "platform": plat,
                      "probe_seconds": round(time.time() - t0, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

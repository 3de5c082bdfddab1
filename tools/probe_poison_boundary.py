#!/usr/bin/env python
"""Bisect the axon remote-compiler poisoning boundary.

Round-3 data: a 1-op jitted f32 matmul runs, a 6-op jitted c64 chain fails
UNIMPLEMENTED at run time, eager per-op programs mostly run.  Somewhere in
between is the boundary that decides the dispatch-granularity policy
(utils/jaxtools.resilient_jit ladder + ops/contract.execute_plan_stepwise)
and whether a real-pair complex representation would dodge the poisoning.

Each candidate program is compiled+run+transferred in its OWN subprocess
(hung RPCs can't be interrupted in-process), classified ok / poisoned /
timeout, one JSON line each.  Run at every weather change; results feed the
policy table in BENCHMARKS.md.
"""
import json
import subprocess
import sys
import time

_HEADER = """
import os
import jax
if os.environ.get("KPBP_PROBE_PLATFORM"):  # CPU self-test of the harness
    jax.config.update("jax_platforms", os.environ["KPBP_PROBE_PLATFORM"])
import jax.numpy as jnp
kr = jax.random.PRNGKey(0)
f = jax.random.normal(kr, (64, 64), jnp.float32)
c = (f + 1j * f.T).astype(jnp.complex64)
"""

# name -> (body producing `out`, uses)
_PROGRAMS = {
    # eager controls: apply_primitive compiles too, but through a different
    # dispatch path — round-3 data (14:39 vs 15:07) suggests eager compiles
    # can be healthy while EVERY jax.jit program of any size is poisoned
    "eager_matmul_f32": "out = f @ f",
    "eager_matmul_c64": "out = c @ c",
    "eager_qr_c64": "out = jnp.linalg.qr(c)[0]",
    # dtype / chain length
    "jit_matmul_f32": "out = jax.jit(lambda a: a @ a)(f)",
    "jit_matmul_c64": "out = jax.jit(lambda a: a @ a)(c)",
    "jit_chain2_f32": "out = jax.jit(lambda a: (a @ a) @ a)(f)",
    "jit_chain2_c64": "out = jax.jit(lambda a: (a @ a) @ a)(c)",
    "jit_chain4_c64": "out = jax.jit(lambda a: ((a @ a) @ a @ a) @ a)(c)",
    # reductions / normalization inside the program
    "jit_norm_f32": "out = jax.jit(lambda a: a / jnp.linalg.norm(a))(f)",
    "jit_norm_c64": "out = jax.jit(lambda a: a / jnp.linalg.norm(a))(c)",
    "jit_sum_c64": "out = jax.jit(lambda a: (a @ a).sum())(c)",
    # linalg lowerings
    "jit_qr_f32": "out = jax.jit(lambda a: jnp.linalg.qr(a)[0])(f)",
    "jit_qr_c64": "out = jax.jit(lambda a: jnp.linalg.qr(a)[0])(c)",
    "jit_svd_f32": "out = jax.jit(lambda a: jnp.linalg.svd(a, full_matrices=False)[1])(f)",
    "jit_svd_c64": "out = jax.jit(lambda a: jnp.linalg.svd(a, full_matrices=False)[1])(c)",
    "jit_eigh_c64": "out = jax.jit(lambda a: jnp.linalg.eigh(a + jnp.conj(a.T))[0])(c)",
    # tensor contractions (BP-shaped)
    "jit_tensordot_c64": ("t = c.reshape(16, 4, 4, 16)\n"
                          "out = jax.jit(lambda a: jnp.tensordot(a, jnp.conj(a), axes=([1], [2])))(t)"),
    "jit_einsum3_c64": ("t = c.reshape(8, 8, 8, 8)\n"
                        "out = jax.jit(lambda a: jnp.einsum('abcd,cdef,efgh->abgh', a, a, a))(t)"),
    # complex-as-real-pair: the dodge candidate if c64 programs poison
    "jit_realpair_matmul": ("re, im = jnp.real(c), jnp.imag(c)\n"
                            "def mm(re, im):\n"
                            "    return re @ re - im @ im, re @ im + im @ re\n"
                            "out = jax.jit(mm)(re, im)"),
    "jit_realpair_chain6": ("re, im = jnp.real(c), jnp.imag(c)\n"
                            "def step(re, im):\n"
                            "    for _ in range(6):\n"
                            "        re, im = re @ re - im @ im, re @ im + im @ re\n"
                            "        n = jnp.sqrt((re * re + im * im).sum())\n"
                            "        re, im = re / n, im / n\n"
                            "    return re, im\n"
                            "out = jax.jit(step)(re, im)"),
    # control flow (plan executors use scan/fori in places)
    "jit_scan_f32": ("out = jax.jit(lambda a: jax.lax.scan("
                     "lambda x, _: (x @ a, None), a, None, length=6)[0])(f)"),
    "jit_scan_c64": ("out = jax.jit(lambda a: jax.lax.scan("
                     "lambda x, _: (x @ a, None), a, None, length=6)[0])(c)"),
    # the 6-op chain that failed in probe_weather (reference point)
    "jit_chain6norm_c64": ("def chain(a):\n"
                           "    for _ in range(6):\n"
                           "        a = (a @ a) / jnp.linalg.norm(a)\n"
                           "    return a\n"
                           "out = jax.jit(chain)(c)"),
}

_FOOTER = """
out = jax.block_until_ready(out)
leaf = jax.tree.leaves(out)[0]
v = float(jnp.abs(jnp.asarray(leaf)).sum())
assert v == v and v not in (float('inf'),), v
print("PROBE_OK", v)
"""


def run_one(name: str, body: str, timeout: int = 240) -> dict:
    code = _HEADER + "\n" + body + "\n" + _FOOTER
    t0 = time.time()
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=timeout)
        if out.returncode == 0 and "PROBE_OK" in out.stdout:
            verdict = "ok"
            detail = ""
        else:
            tail = (out.stderr.strip().splitlines() or ["?"])[-1]
            verdict = "poisoned" if "UNIMPLEMENTED" in out.stderr else "error"
            detail = tail[:120]
    except subprocess.TimeoutExpired:
        verdict, detail = "timeout", f"{timeout}s"
    return {"t": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "program": name, "verdict": verdict,
            "s": round(time.time() - t0, 1),
            **({"detail": detail} if detail else {})}


def main():
    # Poisoning is STOCHASTIC PER COMPILE (observed 14:51: a 1-op jitted f32
    # matmul poisoned, the same program ran fine at 12:59) — so sample each
    # program up to `attempts` times in fresh subprocesses and report how
    # many compiles it took. The per-class success rate, not a binary
    # boundary, is what sets the dispatch-granularity policy.
    import os

    attempts = int(os.environ.get("KPBP_POISON_ATTEMPTS", "3"))
    names = sys.argv[1:] or list(_PROGRAMS)
    results = []
    for name in names:
        rec = {}
        for k in range(1, attempts + 1):
            rec = run_one(name, _PROGRAMS[name])
            rec["attempt"] = k
            print(json.dumps(rec), flush=True)
            if rec["verdict"] == "ok" or rec["verdict"] == "error":
                break
        results.append(rec)
    ok = {r["program"]: r["attempt"] for r in results if r["verdict"] == "ok"}
    bad = [r["program"] for r in results if r["verdict"] != "ok"]
    print(json.dumps({"summary": {"ok_after_attempts": ok, "not_ok": bad}}),
          flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Classify the axon backend weather in one JSON line.

Three independent signals, each probed in a SUBPROCESS so a hung runtime
RPC (observed round 3: device->host copies block in C, defeating SIGALRM)
cannot hang the classifier itself:

  up          tiny f32 matmul executes (block_until_ready)
  transfer_ok a scalar device->host copy completes
  jit_ok      a medium jitted chain (6 chained c64 matmuls + norms, the
              smallest BP-shaped program class) runs AND transfers

Weather classes seen so far: DOWN (tunnel dead), EAGER_ONLY (ops run,
jit poisoned, transfers hang), FLAKY (jit sometimes), GOOD.
tools/weather_watch.sh polls this and fires tools/chip_battery.sh on
improvement.
"""
import json
import subprocess
import sys
import time

_SNIPPETS = {
    "up": """
import jax, jax.numpy as jnp
x = jnp.ones((64, 64), jnp.float32)
jax.block_until_ready(x @ x)
print("OK")
""",
    "transfer_ok": """
import jax, jax.numpy as jnp
x = jnp.ones((64, 64), jnp.float32)
y = jax.block_until_ready(x @ x)
v = float(y[0, 0])
assert v == 64.0, v
print("OK")
""",
    "jit_ok": """
import jax, jax.numpy as jnp
xr = jax.random.normal(jax.random.PRNGKey(0), (64, 64), jnp.float32)
xc = (xr + 1j * xr.T).astype(jnp.complex64)
def chain(a):
    for _ in range(6):
        a = (a @ a) / jnp.linalg.norm(a)
    return jnp.abs(a).sum()
out = jax.block_until_ready(jax.jit(chain)(xc))
v = float(out)
assert v == v, "nan"
print("OK")
""",
}


def probe(name: str, timeout: int) -> dict:
    t0 = time.time()
    try:
        out = subprocess.run([sys.executable, "-c", _SNIPPETS[name]],
                             capture_output=True, text=True, timeout=timeout)
        ok = out.returncode == 0 and "OK" in out.stdout
        err = "" if ok else (out.stderr.strip().splitlines() or ["?"])[-1][:100]
    except subprocess.TimeoutExpired:
        ok, err = False, f"timeout {timeout}s"
    return {name: ok, f"{name}_s": round(time.time() - t0, 1),
            **({f"{name}_err": err} if not ok else {})}


def main():
    result = {"t": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    result.update(probe("up", 120))
    if result["up"]:
        result.update(probe("transfer_ok", 150))
        result.update(probe("jit_ok", 300))
    else:
        result.update({"transfer_ok": False, "jit_ok": False})
    cls = ("DOWN" if not result["up"] else
           "GOOD" if result["jit_ok"] and result["transfer_ok"] else
           "JIT_NO_TRANSFER" if result["jit_ok"] else
           "EAGER_TRANSFER" if result["transfer_ok"] else
           "EAGER_ONLY")
    result["class"] = cls
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

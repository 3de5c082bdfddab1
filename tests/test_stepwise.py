"""The per-step execution tier (ops/contract.execute_plan_stepwise) must be
numerically identical to the whole-program executor — both run the same
`apply_step` code, only the dispatch granularity differs.  This is the
middle rung of the degraded-backend ladder (jit → stepwise → eager), so its
correctness is what makes the automatic fallback safe.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from kagomeperiodicbp_tpu.algo import contraction as C
from kagomeperiodicbp_tpu.algo import fused as F
from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
from kagomeperiodicbp_tpu.ops import mps as mpslib
from kagomeperiodicbp_tpu.ops.contract import execute_plan, execute_plan_stepwise
from kagomeperiodicbp_tpu.ops.mps import MPS

N, D, CHI = 2, 2, 8
DT = jnp.complex128


def _setup(seed=0):
    cell = UnitCell.random(d=2, D=D, key=jax.random.PRNGKey(seed), dtype=DT)
    msgs = C.initial_messages(N, D, CHI, model="random", dtype=DT)
    msg_sites = {int(s): tuple(m.sites) for s, m in msgs.items()}
    return cell, msg_sites


def _mps_dist(a, b):
    """Gauge-invariant distance: 1 − normalized overlap (different program
    partitions legitimately pick different QR gauges for the same state),
    plus the total-scale mismatch."""
    ab, lab = mpslib.inner(a, b)
    aa, laa = mpslib.inner(a, a)
    bb, lbb = mpslib.inner(b, b)
    r = (abs(complex(ab)) / math.sqrt(abs(complex(aa)) * abs(complex(bb)))
         * math.exp(float(lab) - 0.5 * (float(laa) + float(lbb))))
    return abs(1.0 - r) + abs(float(a.logscale) - float(b.logscale))


def _sites_dist(s1, l1, s2, l2):
    rd = jnp.zeros((), s1[0].dtype).real.dtype
    return _mps_dist(MPS(tuple(s1), jnp.asarray(l1, rd)),
                     MPS(tuple(s2), jnp.asarray(l2, rd)))


def test_stepwise_equals_whole_program():
    cell, msg_sites = _setup()
    fused = C.fused_cells(cell)
    plan = C.to_message_plan(N, D, CHI, CHI, 0)
    fetch = C._make_fetch(fused, msg_sites)
    a = execute_plan(plan, fetch)
    b = execute_plan_stepwise(plan, fetch)
    assert _mps_dist(a, b) < 1e-12
    # second run hits the per-step program cache (no new entries)
    n_programs = len(plan._step_cache)
    c = execute_plan_stepwise(plan, fetch)
    assert len(plan._step_cache) == n_programs
    assert _mps_dist(a, c) < 1e-12


def test_stepwise_outgoing_matches_program_tier():
    cell, msg_sites = _setup(1)
    fused = C.fused_cells(cell)
    jit_fn = F._one_side_outgoing_jit(N, D, CHI, CHI, 2, False)
    sw_fn = F._stepwise_outgoing(N, D, CHI, CHI, 2, False)
    s1, l1 = jit_fn(fused, msg_sites)
    s2, l2 = sw_fn(fused, msg_sites)
    assert _sites_dist(s1, l1, s2, l2) < 1e-12


def test_stepwise_single_layer_matches():
    cell, msg_sites = _setup(2)
    kets = (cell.A, cell.B, cell.C)
    jit_fn = F._one_side_outgoing_jit(N, D, CHI, CHI, 1, True)
    sw_fn = F._stepwise_outgoing(N, D, CHI, CHI, 1, True)
    s1, l1 = jit_fn(kets, msg_sites)
    s2, l2 = sw_fn(kets, msg_sites)
    assert _sites_dist(s1, l1, s2, l2) < 1e-12


def test_resilient_fallback_routes_to_stepwise(monkeypatch):
    """A poisoned whole-side program must degrade to the stepwise tier (not
    plain eager): resilient_jit(fallback=...) composition."""
    from kagomeperiodicbp_tpu.utils import jaxtools

    cell, msg_sites = _setup(3)
    fused = C.fused_cells(cell)
    sw_fn = F._stepwise_outgoing(N, D, CHI, CHI, 0, False)
    ref_sites, ref_log = sw_fn(fused, msg_sites)

    real_jit = jax.jit

    def poisoned_jit(fn, **kw):
        def bad(*a, **k):
            raise RuntimeError("UNIMPLEMENTED: TPU backend error (test)")

        return bad

    monkeypatch.setattr(jax, "jit", poisoned_jit)
    monkeypatch.setenv("KPBP_JIT_RETRIES", "0")

    def impl(fused_, msg_sites_):
        out = F._one_outgoing(fused_, msg_sites_, N, D, CHI, CHI, 0)
        wrapped = out.reverse()
        return tuple(wrapped.sites), wrapped.logscale

    wrapped = jaxtools.resilient_jit(impl, fallback=sw_fn)
    monkeypatch.setattr(jax, "jit", real_jit)  # stepwise tier jits normally
    s, l = wrapped(fused, msg_sites)
    assert _sites_dist(s, l, ref_sites, ref_log) < 1e-12

#!/usr/bin/env python
"""Main user entry: ground-state search via BlockBP + ITE.

(reference: /root/reference/scripts/run_ite.py:159)

Examples:
    python scripts/run_ite.py -D 2 -N 2 --steps 20 --dt-start 1e-2 --dt-stop 1e-3
    python scripts/run_ite.py -D 3 -N 2 --hamiltonian AFM --cell random
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_plots(args, ham):
    if not args.live_plots:
        return None
    from kagomeperiodicbp_tpu.visualizations import ITEPlots

    return ITEPlots(active=True, out_path=os.path.join(args.out, "ite_progress.png"),
                    reference_energy=getattr(ham, "reference", None))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-D", type=int, default=2, help="virtual bond dimension")
    p.add_argument("-N", type=int, default=2, help="block linear size")
    p.add_argument("-d", type=int, default=2, help="physical dimension")
    p.add_argument("--hamiltonian", default="AFM", help="AFM | FM | AFM-T | Ising-AFM")
    p.add_argument("--chi-factor", type=float, default=1.0)
    p.add_argument("--dt-start", type=float, default=1e-2)
    p.add_argument("--dt-stop", type=float, default=1e-4)
    p.add_argument("--steps", type=int, default=None, help="total segments (overrides ladder)")
    p.add_argument("--steps-per-dt", type=int, default=20)
    p.add_argument("--cell", default="random",
                   help="random | product | zero | q0 | q0- | su | best | tnsu | <path.pkl> "
                        "(su = simple-update warm start, reference unit_cell_from='tnsu'; "
                        "tnsu = the published tnsu SU state for this D, the reference's "
                        "own warm start (reference run_ite.py:78-107); "
                        "q0/q0- = 120-degree q=0 product order, either chirality; "
                        "best = current best-store record for this D)")
    p.add_argument("--init-noise", type=float, default=0.02,
                   help="noise fraction added to structured inits (q0/zero) "
                        "so virtual bonds start full-rank")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--damping", type=float, default=None)
    p.add_argument("--bp-every-edge", action="store_true")
    p.add_argument("--noise", type=float, default=None)
    p.add_argument("--dtype", default="complex128", choices=["complex64", "complex128", "float32", "float64"])
    p.add_argument("--optimize-dtype", default=None,
                   choices=["complex64", "complex128", "float32", "float64"],
                   help="mixed precision: run BP+ITE segments in this dtype, "
                        "measure in --dtype (attacks the x64 compile wall; "
                        "chip-safe since x64 hangs the axon compiler)")
    p.add_argument("--platform", default=None, help="cpu | tpu (default: as configured)")
    p.add_argument("--out", default="data/unit_cells", help="output folder")
    p.add_argument("--measure-n", type=int, default=None,
                   help="block size for measurements (default: N+1, reference convention)")
    p.add_argument("--measure-chi-factor", type=float, default=2.0)
    p.add_argument("--live-plots", action="store_true",
                   help="write a convergence dashboard PNG per segment")
    p.add_argument("--field-start", type=float, default=1e-2,
                   help="AFM-T initial annealing field (reference: 1e-2)")
    p.add_argument("--fixed-edge-order", action="store_true",
                   help="deterministic edge order (reference production runs)")
    p.add_argument("--use-lowest-energy-state", action="store_true",
                   help="revert to the block-best cell at each delta_t "
                        "boundary (reference: always_use_lowest_energy_state)")
    p.add_argument("--mode-reps", type=int, default=None,
                   help="num_mode_repetitions_per_segment (default 5)")
    p.add_argument("--progress-bars", action="store_true",
                   help="hierarchical progress bars on stderr")
    p.add_argument("--measure-every", type=int, default=1,
                   help="measure every K segments (block ends always measured)")
    p.add_argument("--no-best-store", action="store_true",
                   help="do not write the best store (diagnostics / runs "
                        "seeded from reference-derived cells)")
    p.add_argument("--monitor", action="store_true",
                   help="sample CPU%%/RSS of this process to <out>/monitor.log "
                        "(reference: utils/processes.py monitor_crnt_process)")
    p.add_argument("--strengthen", type=int, default=0, metavar="K",
                   help="apply Config.strengthen K times before running "
                        "(restart-harder: chi and chi_bp x1.5 each; reference: "
                        "global_config.py:92 strengthen on restarted runs)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform if args.platform != "tpu" else "axon,tpu")

    # AFTER the platform switch: with sitecustomize pinning JAX_PLATFORMS=axon,
    # enabling the cache first would hit the axon guard and silently leave
    # --platform cpu runs without the persistent compile cache (cold compiles
    # every run)
    from kagomeperiodicbp_tpu.utils.jaxtools import enable_compilation_cache
    enable_compilation_cache()
    if args.dtype in ("complex128", "float64"):
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from kagomeperiodicbp_tpu.algo.bp import BPConfig
    from kagomeperiodicbp_tpu.algo.ite import ITEConfig, ITETracker, default_time_steps, full_ite
    from kagomeperiodicbp_tpu.networks.unit_cell import UnitCell
    from kagomeperiodicbp_tpu.physics import hamiltonians

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("run_ite")

    _DTYPES = dict(
        complex64=jnp.complex64, complex128=jnp.complex128,
        float32=jnp.float32, float64=jnp.float64,
    )
    measure_dtype = None
    if args.optimize_dtype and args.optimize_dtype != args.dtype:
        # mixed precision: the working dtype is the optimize one; --dtype
        # becomes the measurement dtype (f64 measurements, c64 segments)
        measure_dtype = _DTYPES[args.dtype]
        dtype = _DTYPES[args.optimize_dtype]
    else:
        dtype = _DTYPES[args.dtype]

    steps = default_time_steps(args.dt_start, args.dt_stop, args.steps_per_dt)
    if args.steps is not None:
        steps = steps[: args.steps]

    ham = hamiltonians.BY_NAME[args.hamiltonian]
    # AFM-T = AFM + a decaying symmetry-breaking field (the reference's
    # annealing protocol that reaches the best-store basins from random,
    # run_ite.py:29-41): wire the per-segment field schedule in.
    ham_field = None
    if args.hamiltonian == "AFM-T":
        ham_field = hamiltonians.DecreasingGlobalField(args.field_start)

    cell = None
    if args.cell == "product":
        cell = UnitCell.random_product_state(args.d, args.D, jax.random.PRNGKey(args.seed), dtype)
    elif args.cell == "zero":
        cell = UnitCell.zero_product_state(args.d, args.D, dtype)
        if args.init_noise:
            cell = cell.add_noise(args.init_noise, key=jax.random.PRNGKey(args.seed))
    elif args.cell in ("q0", "q0-"):
        cell = UnitCell.product_state_120(
            args.d, args.D, chirality=+1 if args.cell == "q0" else -1, dtype=dtype)
        if args.init_noise:
            cell = cell.add_noise(args.init_noise, key=jax.random.PRNGKey(args.seed))
    elif args.cell == "su" or args.cell.startswith("su:"):
        from kagomeperiodicbp_tpu.algo.simple_update import simple_update

        # `su` = random seed; `su:q0` / `su:q0-` / `su:product` seed the SU
        # itself from a structured state — a random-seeded 2-site SU on the
        # kagome lattice tends to freeze into a dimerized local minimum
        # (measured −0.326 at D=3 vs the published SU −0.41786), while the
        # 120° q=0 seed keeps it in the magnetically-ordered basin.
        seed_cell = None
        sub = args.cell.partition(":")[2]
        if sub in ("q0", "q0-"):
            seed_cell = UnitCell.product_state_120(
                args.d, args.D, chirality=+1 if sub == "q0" else -1, dtype=dtype)
            seed_cell = seed_cell.add_noise(
                args.init_noise or 0.05, key=jax.random.PRNGKey(args.seed))
        elif sub == "product":
            seed_cell = UnitCell.random_product_state(
                args.d, args.D, jax.random.PRNGKey(args.seed), dtype)
        elif sub:
            raise SystemExit(f"unknown su seed '{sub}' (use q0 | q0- | product)")
        log.info("simple-update warm start (D=%d, seed=%s)…", args.D, sub or "random")
        cell, _ = simple_update(ham(), D=args.D, d=args.d, dtype=dtype,
                                cell=seed_cell,
                                key=jax.random.PRNGKey(args.seed))
    elif args.cell == "best":
        from kagomeperiodicbp_tpu.utils.best_store import load_best

        rec = load_best(args.D)
        if rec is None:
            raise SystemExit(f"no best-store record for D={args.D}")
        cell = rec[0].astype(dtype)
        log.info("warm start from best store: energy=%.10f", rec[1])
    elif args.cell.startswith("pad:"):
        # bond-dimension annealing: best cell of a smaller D, zero-padded
        from kagomeperiodicbp_tpu.utils.best_store import load_best

        d_src = int(args.cell.split(":", 1)[1])
        rec = load_best(d_src)
        if rec is None:
            raise SystemExit(f"no best-store record for D={d_src}")
        cell = rec[0].astype(dtype).pad_to(args.D, key=jax.random.PRNGKey(args.seed))
        log.info("warm start: D=%d best (energy=%.10f) padded to D=%d",
                 d_src, rec[1], args.D)
    elif args.cell == "tnsu" or args.cell.startswith("tnsu:"):
        # the published tnsu SU state — the reference's own warm start
        # (reference: run_ite.py:78-107; bridge in utils/foreign.py)
        from kagomeperiodicbp_tpu.utils.foreign import tnsu_unit_cell

        sub = args.cell.partition(":")[2] or None
        cell, foreign_e = tnsu_unit_cell(args.D, dtype=dtype, path=sub)
        log.info("warm start from tnsu SU state (D=%d, foreign energy=%s)",
                 args.D, foreign_e)
        if args.init_noise:
            cell = cell.add_noise(args.init_noise, key=jax.random.PRNGKey(args.seed))
    elif args.cell not in ("random",):
        cell = UnitCell.load(args.cell)
    # the central config tree (reference: Config.derive_from_dimensions,
    # global_config.py:28) — dimension-derived defaults, then CLI overrides
    from kagomeperiodicbp_tpu.config import Config

    config = Config.derive_from_dimensions(args.D, N=args.N, d=args.d)
    config.dtype = dtype
    config.contraction.trunc_dim_factor = args.chi_factor
    config.visuals.progress_bars = args.progress_bars
    config.visuals.live_plots = args.live_plots
    config.ite = ITEConfig(
        hamiltonian=ham,
        hamiltonian_field=ham_field,
        time_steps=steps,
        bp_every_edge=args.bp_every_edge,
        add_gaussian_noise_fraction=args.noise,
        random_edge_order=not args.fixed_edge_order,
        always_use_lowest_energy_state=args.use_lowest_energy_state,
        seed=args.seed,
    )
    if args.mode_reps is not None:
        config.ite.num_mode_repetitions_per_segment = args.mode_reps
    config.bp = BPConfig(trunc_dim=2 * args.D * args.D, damping=args.damping, dtype=dtype)
    for _ in range(args.strengthen):
        config = config.strengthen()

    os.makedirs(args.out, exist_ok=True)
    tracker = ITETracker(checkpoint_path=os.path.join(args.out, f"tracker_D{args.D}_N{args.N}.pkl"))

    # process monitoring driven by the config tree (reference: main.py:58-72
    # starts the psutil sampler from config.monitoring)
    config.monitoring.monitor_cpu = config.monitoring.monitor_ram = args.monitor
    monitor = None
    if config.monitoring.monitor_cpu or config.monitoring.monitor_ram:
        from kagomeperiodicbp_tpu.utils.logs import ProcessMonitor

        monitor = ProcessMonitor(
            os.path.join(args.out, "monitor.log"),
            track_cpu=config.monitoring.monitor_cpu,
            track_ram=config.monitoring.monitor_ram,
        ).start()

    best, cell, tracker = full_ite(
        cell, config.ite, N=args.N, D=args.D, d=args.d, chi=config.chi,
        bp_config=config.bp, logger=log, tracker=tracker, dtype=dtype,
        measurement_N=args.measure_n or args.N + 1,
        measurement_chi_factor=args.measure_chi_factor,
        measure_dtype=measure_dtype,
        measure_every=args.measure_every,
        save_best_store=not args.no_best_store,
        plots=_make_plots(args, ham),
        progress=config.visuals.progress_hierarchy(),
    )

    if monitor is not None:
        monitor.stop()
    out_path = os.path.join(args.out, f"D={args.D} energy={best}.pkl")
    cell.save(out_path)
    log.info("best energy/site = %.10f  (saved unit cell to %s)", best, out_path)
    if getattr(ham, "reference", None) is not None:
        log.info("reference energy  = %.10f", ham.reference)
    return best


if __name__ == "__main__":
    main()

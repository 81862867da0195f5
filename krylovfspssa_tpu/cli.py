"""Command-line interface — the analog of the reference driver programs.

``kfs solve``  replicates ``test/TestSolverFromFile.f90``: load a model
(``.input`` file or built-in library name), solve the CME to a final time,
print per-step statistics and the elapsed wall time, optionally save the
final (states, probabilities) to ``.npz``.

``kfs models`` lists the built-in model library (the reference ``examples/``
programs); ``kfs info`` prints a model summary; ``kfs bench`` runs the SpMV
roofline benchmark from the repo's ``bench.py`` accounting.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def _load(spec: str, params: list[float] | None):
    from .models.library import DRIVER_PARAMETERS, LIBRARY, get_model
    from .models.model import load_model

    if spec in LIBRARY:
        model = get_model(spec)
    else:
        path = Path(spec)
        if not path.exists():
            raise SystemExit(
                f"kfs: {spec!r} is neither a built-in model "
                f"({sorted(LIBRARY)}) nor a file"
            )
        model = load_model(path)
        if params is None and path.stem in DRIVER_PARAMETERS:
            # the .input format carries parameter names only; apply the
            # values the reference driver resets this model to (e.g.
            # TestSolverFromFile.f90:31) so `kfs solve models/x.input`
            # solves the same CME as the corresponding driver program
            params = DRIVER_PARAMETERS[path.stem]
            print(
                f"kfs: using reference-driver parameters for {path.stem}: "
                f"{params} (override with --params)"
            )
    if params is not None:
        model.reset_parameters(params)
    return model


def _parse_state(text: str | None, n_species: int) -> np.ndarray:
    if text is None:
        return np.zeros((1, n_species), dtype=np.int64)
    x0 = np.array([int(v) for v in text.replace(",", " ").split()])
    if x0.size != n_species:
        raise SystemExit(
            f"kfs: --x0 has {x0.size} entries, model has {n_species} species"
        )
    return x0[None, :]


def cmd_solve(args) -> int:
    from .boxsolver import solve_cme_box
    from .config import SolverConfig
    from .solver import solve_cme

    model = _load(args.model, args.params)
    x0 = _parse_state(args.x0, model.n_species)
    cfg_kwargs = {}
    if args.dtype:
        cfg_kwargs["dtype"] = args.dtype
    if args.no_fused:
        cfg_kwargs["fused_steps"] = False
    if getattr(args, "table_operator", None):
        cfg_kwargs["table_operator"] = args.table_operator
    config = SolverConfig(**cfg_kwargs)

    mesh = None
    if args.multihost:
        from .parallel import multihost

        multihost.initialize()
        mesh = multihost.global_mesh()
    elif args.devices:
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        if args.devices > len(devs):
            raise SystemExit(
                f"kfs: --devices {args.devices} requested but only "
                f"{len(devs)} visible (set XLA_FLAGS="
                "--xla_force_host_platform_device_count=N for a CPU mesh)"
            )
        mesh = Mesh(np.asarray(devs[: args.devices]), ("s",))

    kwargs = {}
    if args.backend == "box":
        solve = solve_cme_box
        kwargs["mesh"] = mesh
        if args.checkpoint:
            kwargs["checkpoint_path"] = args.checkpoint
            kwargs["checkpoint_every"] = args.checkpoint_every
        if args.resume:
            kwargs["resume_from"] = args.resume
    else:
        solve = solve_cme
        kwargs["mesh"] = mesh
        if args.checkpoint:
            kwargs["checkpoint_path"] = args.checkpoint
            kwargs["checkpoint_every"] = args.checkpoint_every
        if args.resume:
            kwargs["resume_from"] = args.resume

    import contextlib

    profile_cm = contextlib.nullcontext()
    if args.profile:
        import jax

        profile_cm = jax.profiler.trace(args.profile)

    t0 = time.perf_counter()
    with profile_cm:
        res = solve(
            model,
            args.t,
            x0,
            fsp_tol=args.fsp_tol,
            krylov_tol=args.krylov_tol,
            config=config,
            verbosity=args.verbose,
            **kwargs,
        )
    wall = time.perf_counter() - t0

    if args.log_steps:
        import dataclasses as _dc

        with open(args.log_steps, "w") as fh:
            for rec in res.stats.records:
                fh.write(json.dumps(_dc.asdict(rec)) + "\n")

    s = res.stats
    print(f"model          : {model.name or args.model}")
    print(f"backend        : {args.backend}")
    print(f"t_final        : {s.t_final:g}")
    print(f"final FSP size : {s.final_fsp_size}")
    print(f"wsum           : {res.wsum:.10f}   (1-wsum = {1 - res.wsum:.3e})")
    print(f"steps          : {s.nstep}  (rejections {s.nreject}, "
          f"expansions {s.n_expansions}, drops {s.n_drops})")
    print(f"matvecs        : {s.nmult}   expm evals: {s.nexph}")
    print(f"step size      : [{s.step_min:.3g}, {s.step_max:.3g}]")
    print(f"elapsed        : {wall:.3f} s")

    if args.output:
        np.savez_compressed(
            args.output,
            states=res.states,
            probabilities=res.probabilities,
            t=res.t,
            wsum=res.wsum,
        )
        print(f"saved          : {args.output}")
    if args.json:
        rec = {
            "model": model.name or args.model,
            "backend": args.backend,
            "t": s.t_final,
            "fsp_size": s.final_fsp_size,
            "wsum": res.wsum,
            "nstep": s.nstep,
            "nreject": s.nreject,
            "nmult": s.nmult,
            "wall_s": wall,
        }
        print(json.dumps(rec))
    return 0


def cmd_models(args) -> int:
    from .models.library import LIBRARY, get_model

    for name in sorted(LIBRARY):
        try:
            m = get_model(name)
            print(f"{name:28s} {m.n_species} species, "
                  f"{m.n_reactions} reactions")
        except Exception as e:  # broken bundled inputs (SURVEY.md §2)
            print(f"{name:28s} UNUSABLE: {e}")
    return 0


def cmd_info(args) -> int:
    model = _load(args.model, None)
    print(f"name       : {model.name}")
    print(f"species    : {', '.join(model.species_names)}")
    print(f"parameters : "
          + ", ".join(
              f"{n}={v:g}"
              for n, v in zip(model.parameter_names, model.parameters)
          ))
    print("reactions  :")
    stoich = np.asarray(model.stoichiometry)
    for k in range(model.n_reactions):
        nu = stoich[k]
        terms = [
            f"{'+' if v > 0 else ''}{v} {s}"
            for v, s in zip(nu, model.species_names)
            if v != 0
        ]
        expr = (
            model.propensity_expressions[k]
            if model.propensity_expressions
            else "<custom>"
        )
        print(f"  R{k + 1}: {', '.join(terms) or '(null)'}    a = {expr}")
    return 0


def cmd_bench(args) -> int:
    import runpy

    bench = Path(__file__).resolve().parent.parent / "bench.py"
    if not bench.exists():
        raise SystemExit("kfs: bench.py not found next to the package")
    sys.argv = [str(bench)]
    runpy.run_path(str(bench), run_name="__main__")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="kfs",
        description="TPU-native Krylov-FSP-SSA solver for the Chemical "
        "Master Equation",
    )
    sub = p.add_subparsers(dest="command", required=True)

    ps = sub.add_parser("solve", help="solve a CME model to a final time")
    ps.add_argument("model", help=".input file path or built-in model name")
    ps.add_argument("--t", type=float, default=1000.0,
                    help="final time T_OUT (default 1000, the "
                    "TestSolverFromFile setting)")
    ps.add_argument("--fsp-tol", type=float, default=1e-4)
    ps.add_argument("--krylov-tol", type=float, default=1e-10)
    ps.add_argument("--x0", help="initial state, e.g. '0,0' (default all 0)")
    ps.add_argument("--params", type=float, nargs="+",
                    help="override model parameters")
    ps.add_argument("--backend", choices=("box", "table"), default="box")
    ps.add_argument("--dtype", choices=("auto", "float64", "float32"),
                    help="probability-vector dtype. auto (default) = "
                    "float32 on TPU, float64 on CPU; float32 certifies "
                    "fsp_tol only down to ~1.5e-5 (the per-step noise "
                    "floor is reserved out of the budget, so the FSP "
                    "guarantee stays exactly fsp_tol) — tighter requests "
                    "fall back to float64 under auto and are refused "
                    "under explicit float32")
    ps.add_argument("--devices", type=int, metavar="N",
                    help="row-partition the solve over the first N local "
                    "devices (box backend; jax.sharding 1-D mesh)")
    ps.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed and mesh over ALL "
                    "devices of all processes (run one process per host)")
    ps.add_argument("--no-fused", action="store_true",
                    help="disable the fused device main loop")
    ps.add_argument("--table-operator", choices=("auto", "ell", "pencil"),
                    help="table-backend operator representation: ell = "
                    "reference-format gather-ELL; pencil = support-"
                    "adapted row-gather + lane-shift (no per-element "
                    "gathers — the TPU fast path for large supports); "
                    "auto (default) picks pencil on single-device TPU "
                    "solves when the layout stays efficient")
    ps.add_argument("-v", "--verbose", action="count", default=0)
    ps.add_argument("-o", "--output", help="save result to .npz")
    ps.add_argument("--json", action="store_true",
                    help="also print a JSON summary line")
    ps.add_argument("--checkpoint", help="write solve snapshots to this .npz")
    ps.add_argument("--checkpoint-every", type=int, default=50,
                    help="steps between snapshots (default 50)")
    ps.add_argument("--resume", help="resume a solve from a snapshot .npz")
    ps.add_argument("--profile",
                    help="write a jax.profiler trace to this directory")
    ps.add_argument("--log-steps",
                    help="write per-step records as JSON lines to this file")
    ps.set_defaults(fn=cmd_solve)

    pm = sub.add_parser("models", help="list built-in models")
    pm.set_defaults(fn=cmd_models)

    pi = sub.add_parser("info", help="print a model summary")
    pi.add_argument("model")
    pi.set_defaults(fn=cmd_info)

    pb = sub.add_parser("bench", help="run the SpMV roofline benchmark")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

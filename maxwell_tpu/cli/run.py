"""CLI driver: `python -m maxwell_tpu.cli.run configs/config2.json [overrides]`.

Config schema (JSON):
{
  "problem": {"kind": "rect2d"|"brick3d", "a":1, "b":1, ["c":1],
               "nx":16, "ny":16, ["nz":16]},
  "solver":  {"kind": "lanczos"|"tr_lanczos"|"lobpcg"|"shift_invert"|"lobpcg_dist",
               "nev":5, "tol":1e-8, "maxiter":200, ...},
  "storage": {"block": 8, "dtype": "f32"|"f64", "kernel": "ref"|"pallas"},
  "dist":    {"n_shards": 8}            # lobpcg_dist only
}

Emits per-iteration JSON lines (residual history) and a final report with
eigenvalues, residuals, timing, and analytic parity when available
(SURVEY.md §5.5/§5.6).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def material_grids(cfg):
    """Per-cell eps_r/mu_r from the JSON "materials" block (round 4):

      "materials": {"eps_fill": {"value": 2.5,
                                 "box": [x0, x1, y0, y1, z0, z1]},
                    "mu_fill":  {...}}

    box is in FRACTIONAL cell coordinates (0..1 per axis; default fills
    the whole cavity). Returns (eps_r, mu_r) numpy grids or (None, None).
    """
    import numpy as np

    mcfg = cfg.get("materials")
    if not mcfg:
        return None, None
    nx, ny, nz = cfg.get("nx", 8), cfg.get("ny", 8), cfg.get("nz", 8)

    def grid(spec):
        if spec is None:
            return None
        g = np.ones((nx, ny, nz))
        box = spec.get("box", [0, 1, 0, 1, 0, 1])
        i0, i1 = int(box[0] * nx), max(int(box[1] * nx), int(box[0] * nx) + 1)
        j0, j1 = int(box[2] * ny), max(int(box[3] * ny), int(box[2] * ny) + 1)
        k0, k1 = int(box[4] * nz), max(int(box[5] * nz), int(box[4] * nz) + 1)
        g[i0:i1, j0:j1, k0:k1] = spec.get("value", 1.0)
        return g

    return grid(mcfg.get("eps_fill")), grid(mcfg.get("mu_fill"))


def build_problem(cfg):
    kind = cfg.get("kind", "rect2d")
    if kind == "rect2d":
        from maxwell_tpu.problems import RectCavity2D

        return RectCavity2D(
            a=cfg.get("a", 1.0),
            b=cfg.get("b", 1.0),
            nx=cfg.get("nx", 16),
            ny=cfg.get("ny", 16),
            bc=cfg.get("bc", "pec"),
        )
    if kind == "brick3d":
        from maxwell_tpu.problems import BrickCavity3D

        eps_r, mu_r = material_grids(cfg)
        return BrickCavity3D(
            a=cfg.get("a", 1.0),
            b=cfg.get("b", 1.0),
            c=cfg.get("c", 1.0),
            nx=cfg.get("nx", 8),
            ny=cfg.get("ny", 8),
            nz=cfg.get("nz", 8),
            bc=cfg.get("bc", "pec"),
            eps_r=eps_r,
            mu_r=mu_r,
        )
    if kind == "tet3d":
        # unstructured tetrahedral Nedelec on a Kuhn-triangulated brick
        # (problems/tetmesh.py); "jiggle" perturbs interior vertices so the
        # mesh is genuinely non-tensor-product
        import numpy as np

        from maxwell_tpu.problems.tetmesh import TetCavity, brick_tet_mesh

        a, b, c = cfg.get("a", 1.0), cfg.get("b", 1.0), cfg.get("c", 1.0)
        n = cfg.get("n", cfg.get("nx", 6))
        jig = cfg.get("jiggle", 0.0)
        if jig:
            verts, tets = brick_tet_mesh(a, b, c, n, n, n)
            rng = np.random.default_rng(cfg.get("seed", 0))
            eps = 1e-9
            interior = np.all(
                (verts > eps) & (verts < np.array([a, b, c]) - eps), axis=1
            )
            verts = verts.copy()
            verts[interior] += (
                jig * (a / n) * rng.standard_normal((int(interior.sum()), 3))
            )
            return TetCavity(a=a, b=b, c=c, verts=verts, tets=tets)
        return TetCavity(a=a, b=b, c=c, n=n)
    raise ValueError(f"unknown problem kind {kind!r}")


def main(argv=None):
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="path to JSON config")
    ap.add_argument("--nev", type=int, default=None)
    ap.add_argument("--tol", type=float, default=None)
    ap.add_argument("--maxiter", type=int, default=None)
    ap.add_argument("--checkpoint", default=None, help="state file for save/resume")
    ap.add_argument(
        "--checkpoint-every", type=int, default=0,
        help="also save the Ritz block every K iterations from inside the "
        "compiled loop (kill-mid-solve recovery; SURVEY.md §5.4)",
    )
    ap.add_argument(
        "--save-eigenvectors", default=None,
        help="write eigenpairs (values + vectors) to this .npz",
    )
    ap.add_argument(
        "--platform", default=None, choices=("cpu", "tpu", "axon"),
        help="force the JAX backend (the JAX_PLATFORMS env var is ignored "
        "in this environment: jax is imported at interpreter startup, so "
        "only jax.config.update before first backend use works)",
    )
    ap.add_argument(
        "--refine", action="store_true",
        help="mixed-precision polish to tol after the device solve: f64 "
        "host RQI sweeps for assembled operators, warm-started f64 CPU "
        "LOBPCG for matrix-free (stencil) pencils — the TPU path to 1e-8 "
        "(solvers/refine.py)",
    )
    args = ap.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    with open(args.config) as f:
        cfg = json.load(f)
    scfg = cfg.get("solver", {})
    if args.nev is not None:
        scfg["nev"] = args.nev
    if args.tol is not None:
        scfg["tol"] = args.tol
    if args.maxiter is not None:
        scfg["maxiter"] = args.maxiter

    stg = cfg.get("storage", {})
    dtype = {"f32": jnp.float32, "f64": jnp.float64}[stg.get("dtype", "f64")]
    use_stencil = stg.get("operator") == "stencil"
    force_refine = False
    if dtype == jnp.float64:
        if jax.devices()[0].platform == "tpu":
            # the axon TPU stores f64 at f32 precision (transfers truncate
            # through f32) and emulates f64 arithmetic ~100x slower than
            # f32 — a "f64 on TPU" run would be silently wrong AND slow.
            print(
                "f64 requested on a TPU backend: switching to mixed "
                "precision (f32 device solve + f64 host refinement; "
                "solvers/refine.py). Pass --platform cpu for true f64.",
                file=sys.stderr, flush=True,
            )
            dtype = jnp.float32
            force_refine = True
        else:
            jax.config.update("jax_enable_x64", True)
    block = stg.get("block")  # None -> per-kernel auto layout
    kernel = stg.get("kernel", "auto")
    if kernel == "auto":
        # PRODUCTION path on real TPUs: the BELLUnion Pallas kernel (f32,
        # assembled operators — round-2 VERDICT item 4); XLA einsum
        # reference elsewhere (Pallas TPU kernels do not lower on CPU
        # outside interpret mode, and f64 runs use the reference path)
        kernel = (
            "union"
            if (
                jax.devices()[0].platform == "tpu"
                and dtype == jnp.float32
                and not use_stencil
            )
            else "ref"
        )
    t0 = time.perf_counter()
    # the assembly-free (stencil) path must not pay host CSR assembly —
    # build the assembled problem lazily only where matrices are consumed
    problem = None if use_stencil else build_problem(cfg.get("problem", {}))
    t_setup = time.perf_counter() - t0

    kind = scfg.get("kind", "lobpcg")
    nev = scfg.get("nev", 5)
    tol = scfg.get("tol", 1e-8)
    maxiter = scfg.get("maxiter", 200)
    want_refine = args.refine or scfg.get("refine", False) or force_refine
    # with refinement the device solve only needs the fp32-comfortable
    # part. f64 backends keep the full tolerance: staged (batch) runs
    # hard-deflate each stage's block, and deflation quality equals the
    # block's residual — stages left at 1e-5 seeded duplicate eigenpairs
    # that grew ~2x/iteration under the preconditioner (round 5).
    full_tol = tol
    if want_refine and dtype == jnp.float32:
        tol = max(tol, 1e-5)

    t0 = time.perf_counter()
    if kind == "lobpcg_dist":
        from maxwell_tpu.dist import make_mesh, partition_problem
        from maxwell_tpu.solvers.dist_solve import lobpcg_dist

        D = cfg.get("dist", {}).get("n_shards", len(jax.devices()))
        if D > len(jax.devices()):
            # degenerate-mesh rule (SURVEY.md §4): the same SPMD program
            # runs at any device count — clamp so configs written for the
            # simulated 8-device mesh run on the single real chip
            print(
                f"dist.n_shards={D} > {len(jax.devices())} visible "
                f"device(s): clamping (mesh-of-{len(jax.devices())})",
                file=sys.stderr, flush=True,
            )
            D = len(jax.devices())
        pcfg = cfg.get("problem", {})
        if stg.get("operator") == "stencil":
            if pcfg.get("kind") != "brick3d":
                raise ValueError("distributed stencil operator is 3D-only")
            from maxwell_tpu.dist.stencil_dist import DistStencilPencil3D

            dp = DistStencilPencil3D.build(
                a=pcfg.get("a", 1.0), b=pcfg.get("b", 1.0),
                c_len=pcfg.get("c", 1.0), nx=pcfg.get("nx", 8),
                ny=pcfg.get("ny", 8), nz=pcfg.get("nz", 8),
                D=D, dtype=dtype, block=block or 8,
            )
        else:
            dp = partition_problem(
                problem, D, block=block, kernel=kernel, dtype=dtype
            )
        mesh = make_mesh(D)
        # staged stencil runs with refinement: polish EACH stage's block
        # on device before it joins the deflation basis — an f32-floor
        # stage (~1e-5) would otherwise seed duplicate eigenpairs in the
        # next stage (deflation quality equals the basis residual)
        stage_polish = None
        if (
            want_refine
            and scfg.get("batch")
            and getattr(dp, "taps_dw", None) is not None
        ):
            from maxwell_tpu.solvers.refine_device import refine_dw_dist

            def stage_polish(r):
                return refine_dw_dist(
                    dp, mesh, r.eigenvectors, tol=full_tol
                )

        res = lobpcg_dist(
            dp,
            mesh,
            nev=nev,
            m=scfg.get("block_size"),
            maxiter=maxiter,
            tol=tol,
            precond_alpha=scfg.get("precond_alpha"),
            precond_iters=scfg.get("precond_iters", 20),
            checkpoint=args.checkpoint,
            checkpoint_every=args.checkpoint_every,
            batch=scfg.get("batch"),
            # when a refinement pass follows ON AN F32 DEVICE, cut at the
            # f32 floor and return the best iterate instead of bouncing
            # to maxiter (round 4: an unstalled f32 dist solve at tol
            # below its floor returned a degraded final block). f64 runs
            # have no such floor — a stall cut there fires MID-convergence
            # on slowly-separating degenerate clusters and hands the
            # refine a half-converged block (round 5: config5's 8pi^2
            # triple collapsed in the RR for exactly this reason).
            stall_window=scfg.get(
                "stall_window",
                15 if (want_refine and dtype == jnp.float32) else 0,
            ),
            stage_polish=stage_polish,
        )
        if stage_polish is not None:
            # stages are already refined to full_tol — the generic
            # refine pass below would be redundant work
            want_refine = False
    else:
        pcfg = cfg.get("problem", {})
        if stg.get("operator") == "stencil":
            # assembly-free matrix-free operator (tensor grids only);
            # block only sets padding granularity here
            if pcfg.get("kind", "rect2d") == "rect2d":
                from maxwell_tpu.problems.stencil2d import StencilPencil2D

                pencil = StencilPencil2D.build(
                    a=pcfg.get("a", 1.0), b=pcfg.get("b", 1.0),
                    nx=pcfg.get("nx", 16), ny=pcfg.get("ny", 16),
                    dtype=dtype, block=block or 8,
                    bc=pcfg.get("bc", "pec"),
                )
            else:
                from maxwell_tpu.problems.stencil3d import StencilPencil3D

                eps_r3, mu_r3 = material_grids(pcfg)
                pencil = StencilPencil3D.build(
                    a=pcfg.get("a", 1.0), b=pcfg.get("b", 1.0),
                    c=pcfg.get("c", 1.0), nx=pcfg.get("nx", 8),
                    ny=pcfg.get("ny", 8), nz=pcfg.get("nz", 8),
                    dtype=dtype, block=block or 8,
                    bc=pcfg.get("bc", "pec"),
                    eps_r=eps_r3, mu_r=mu_r3,
                )
        else:
            from maxwell_tpu.solvers.operator import Pencil

            pencil = Pencil.from_problem(
                problem, block=block, kernel=kernel, dtype=dtype
            )
        if kind == "lanczos":
            from maxwell_tpu.solvers import lanczos

            res = lanczos(pencil, nev=nev, maxiter=maxiter, tol=tol)
        elif kind == "tr_lanczos":
            from maxwell_tpu.solvers.trlanczos import thick_restart_lanczos

            res = thick_restart_lanczos(
                pencil, nev=nev, ncv=scfg.get("ncv"),
                max_restarts=scfg.get("max_restarts", 40), tol=tol,
            )
        elif kind == "shift_invert" and stg.get("operator") == "stencil":
            raise ValueError(
                "shift_invert needs assembled matrices (factorization); "
                "drop storage.operator=stencil"
            )
        elif kind == "shift_invert":
            from maxwell_tpu.solvers.shift_invert import shift_invert_lanczos

            res = shift_invert_lanczos(
                pencil,
                sigma=scfg.get("sigma", 1.0),
                nev=nev,
                maxiter=maxiter,
                tol=tol,
                KM=(problem.K, problem.M),  # factor the assembled matrices
            )
        elif kind == "lobpcg":
            from maxwell_tpu.solvers import lobpcg
            from maxwell_tpu.solvers.precond import shifted_cg_preconditioner

            pc = None
            if scfg.get("precond_alpha") is not None:
                kind = scfg.get("precond", "auto")
                if kind in ("auto", "spectral"):
                    # exact spectral (K + alpha M)^-1 for vacuum-PEC
                    # stencil pencils: grid-independent iteration count
                    # (solvers/spectral.py)
                    try:
                        from maxwell_tpu.solvers.spectral import (
                            spectral_preconditioner,
                        )

                        pc = spectral_preconditioner(
                            pencil, alpha=scfg["precond_alpha"]
                        )
                    except (ValueError, AttributeError):
                        if kind == "spectral":
                            raise
                if pc is None:
                    pc = shifted_cg_preconditioner(
                        pencil,
                        alpha=scfg["precond_alpha"],
                        iters=scfg.get("precond_iters", 20),
                    )
            res = lobpcg(
                pencil,
                nev=nev,
                m=scfg.get("block_size"),
                maxiter=maxiter,
                tol=tol,
                precond=pc,
                checkpoint=args.checkpoint,
                checkpoint_every=args.checkpoint_every,
                log_every=scfg.get("log_every", 0),
            )
        else:
            raise ValueError(f"unknown solver {kind!r}")
    t_solve = time.perf_counter() - t0

    t_refine = None
    if want_refine and res.eigenvectors is not None:
        t0 = time.perf_counter()
        _pc = locals().get("pencil")
        if (
            kind == "lobpcg_dist"
            and use_stencil
            and getattr(dp, "taps_dw", None) is not None
        ):
            # DISTRIBUTED on-device dw refinement (round-4 VERDICT item
            # 7: config5's exact bench path runnable by name): the same
            # sharded RQI the bench records, under the run's own mesh
            from maxwell_tpu.solvers.refine_device import refine_dw_dist

            ref = refine_dw_dist(dp, mesh, res.eigenvectors, tol=full_tol)
        elif use_stencil and (
            getattr(_pc, "taps_dw", None) is not None
            or (
                getattr(_pc, "ftaps_Kdw", None) is not None
                and getattr(_pc, "bc", "pec") == "pec"
            )
        ):
            # ON-DEVICE double-word RQI refinement (round-3 VERDICT item
            # 1): PEC 3D stencil pencils — vacuum (exact spectral shift
            # solves) AND loaded (preconditioned block MINRES
            # corrections) — refine to 1e-8 on the accelerator
            # (solvers/refine_device.py); the host touches one (m, m)
            # eigh. Orders of magnitude faster than the f64 host polish.
            from maxwell_tpu.solvers.refine_device import refine_dw

            ref = refine_dw(pencil, res.eigenvectors, tol=full_tol)
        elif use_stencil:
            # matrix-free polish: rebuild the SAME stencil pencil at f64 on
            # CPU and continue LOBPCG from the f32 block — never assembles K
            # (VERDICT.md round-1 item 3; BASELINE "time-to-1e-8")
            from maxwell_tpu.solvers.refine import refine_f64_pencil

            pcfg = cfg.get("problem", {})
            if pcfg.get("kind", "rect2d") == "rect2d":
                from maxwell_tpu.problems.stencil2d import StencilPencil2D

                def build_f64():
                    return StencilPencil2D.build(
                        a=pcfg.get("a", 1.0), b=pcfg.get("b", 1.0),
                        nx=pcfg.get("nx", 16), ny=pcfg.get("ny", 16),
                        dtype=jnp.float64, block=block or 8,
                        bc=pcfg.get("bc", "pec"),
                    )
            else:
                from maxwell_tpu.problems.stencil3d import StencilPencil3D

                def build_f64():
                    return StencilPencil3D.build(
                        a=pcfg.get("a", 1.0), b=pcfg.get("b", 1.0),
                        c=pcfg.get("c", 1.0), nx=pcfg.get("nx", 8),
                        ny=pcfg.get("ny", 8), nz=pcfg.get("nz", 8),
                        dtype=jnp.float64, block=block or 8,
                        bc=pcfg.get("bc", "pec"),
                    )

            ref = refine_f64_pencil(
                build_f64, res.eigenvectors, tol=full_tol,
                precond_alpha=scfg.get("precond_alpha", 15.0),
                precond_iters=scfg.get("precond_iters", 16),
            )
        else:
            from maxwell_tpu.solvers.refine import refine_f64

            ref = refine_f64(
                problem, res.eigenvectors, theta=res.eigenvalues,
                tol=full_tol,
            )
        t_refine = time.perf_counter() - t0
        ref.history = list(res.history) + [
            dict(h, phase="refine") for h in ref.history
        ]
        ref.iterations += res.iterations
        res = ref

    for h in res.history:
        print(json.dumps(h))

    if use_stencil:
        if kind == "lobpcg_dist":
            # GLOBAL problem size (dp.n is the per-shard local size)
            n_report = getattr(dp, "n_full", None) or dp.n
        else:
            n_report = pencil.n
    else:
        n_report = problem.n_edges
    report = {
        "eigenvalues": [float(v) for v in res.eigenvalues],
        "residuals": [float(r) for r in res.residuals],
        "iterations": res.iterations,
        "converged": res.converged,
        "t_setup_s": t_setup,
        "t_solve_s": t_solve,
        "n": int(n_report),
    }
    if t_refine is not None:
        report["t_refine_s"] = t_refine
    if (
        kind != "shift_invert"
        and cfg.get("problem", {}).get("bc", "pec") == "pec"
        and not cfg.get("problem", {}).get("materials")
    ):
        # (loaded cavities have no closed-form modes — no analytic row)
        # analytic oracle lists the SMALLEST PEC modes
        try:
            pcfg = cfg.get("problem", {})
            if pcfg.get("kind", "rect2d") == "rect2d":
                from maxwell_tpu.problems.analytic import te_eigenvalues_2d

                exact = te_eigenvalues_2d(
                    pcfg.get("a", 1.0), pcfg.get("b", 1.0), nev
                )
            else:
                from maxwell_tpu.problems.analytic import (
                    cavity_eigenvalues_3d,
                )

                exact = cavity_eigenvalues_3d(
                    pcfg.get("a", 1.0), pcfg.get("b", 1.0),
                    pcfg.get("c", 1.0), nev,
                )
            report["analytic"] = [float(v) for v in exact]
            report["analytic_rel_err"] = [
                float(abs(v - e) / e)
                for v, e in zip(res.eigenvalues, exact)
            ]
        except Exception:
            pass
    if args.save_eigenvectors:
        import numpy as np

        np.savez(
            args.save_eigenvectors,
            eigenvalues=res.eigenvalues,
            eigenvectors=res.eigenvectors,
            residuals=res.residuals,
        )
        report["eigenvectors_file"] = args.save_eigenvectors
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())

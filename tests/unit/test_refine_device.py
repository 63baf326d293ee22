"""On-device double-word refinement (solvers/refine_device.py) vs f64
oracles — the round-3 VERDICT item-1 path, validated on the CPU backend
where f32 arithmetic is bit-identical to the chip's XLA semantics for the
elementwise/matmul ops used (the dw error-free transforms are themselves
oracle-tested in test_twofloat.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxwell_tpu.problems.stencil3d import StencilPencil3D
from maxwell_tpu.utils import twofloat as tf


@pytest.fixture(scope="module")
def pencils():
    p32 = StencilPencil3D.build(nx=8, ny=8, nz=8, dtype=jnp.float32)
    p64 = StencilPencil3D.build(nx=8, ny=8, nz=8, dtype=jnp.float64)
    return p32, p64


def test_dw_apply_matches_f64(pencils):
    """KM_mm_dw == the f64 apply to ~1e-12 relative (far below the ~1e-7
    floor of the f32 apply)."""
    p32, p64 = pencils
    rng = np.random.default_rng(0)
    X64 = rng.standard_normal((p32.n_padded, 4))
    Xh, Xl = tf.dw_from_f64(X64)
    X64 = tf.dw_to_f64(Xh, Xl)  # exactly-representable value

    (KXh, KXl), (MXh, MXl) = jax.jit(p32.KM_mm_dw)(
        jnp.asarray(Xh), jnp.asarray(Xl)
    )
    K64 = np.asarray(p64.K_mm(jnp.asarray(X64)))
    M64 = np.asarray(p64.M_mm(jnp.asarray(X64)))

    for got_h, got_l, ref in ((KXh, KXl, K64), (MXh, MXl, M64)):
        got = tf.dw_to_f64(np.asarray(got_h), np.asarray(got_l))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 1e-12, f"dw apply off by {rel:.2e}"
        # and the f32 apply is demonstrably WORSE (sanity of the premise)
    Kf32 = np.asarray(p32.K_mm(jnp.asarray(X64, jnp.float32)), np.float64)
    rel32 = np.abs(Kf32 - K64).max() / np.abs(K64).max()
    assert rel32 > 1e-8, "f32 apply unexpectedly exact; dw path pointless?"


def test_solve_sigma_is_exact_shift_invert(pencils):
    """(K - sigma M) @ solve_sigma(R) == R per column at distinct sigmas."""
    from maxwell_tpu.solvers.spectral import SpectralShiftSolver

    p32, p64 = pencils
    sol = SpectralShiftSolver.build(
        1.0, 1.0, 1.0, 8, 8, 8, alpha=0.0, n_padded=p64.n_padded,
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(1)
    R = jnp.asarray(
        rng.standard_normal((p64.n_padded, 3)), jnp.float64
    ) * p64.mask[:, None]
    sigma = jnp.asarray([5.0, 17.3, 40.0], jnp.float64)
    W = sol.solve_sigma(R, sigma)
    KW = p64.K_mm(W)
    MW = p64.M_mm(W)
    got = np.asarray(KW) - np.asarray(MW) * np.asarray(sigma)[None, :]
    # exact on the PEC-interior rows (the solver's domain)
    mask = np.asarray(p64.mask)[:, None].astype(bool)
    err = np.abs(np.where(mask, got - np.asarray(R), 0.0)).max()
    assert err < 1e-9, f"shift solve residual {err:.2e}"


def test_refine_dw_reaches_1e8(pencils):
    """End to end: f32 LOBPCG block (~1e-5 floor) -> refine_dw -> residual
    <= 1e-8 verified against the INDEPENDENT f64 pencil."""
    from maxwell_tpu.solvers import lobpcg
    from maxwell_tpu.solvers.refine_device import refine_dw
    from maxwell_tpu.solvers.spectral import spectral_preconditioner

    p32, p64 = pencils
    pc = spectral_preconditioner(p32, alpha=15.0)
    res32 = lobpcg(
        p32, nev=5, maxiter=60, tol=1e-5, precond=pc, stall_window=10
    )
    assert res32.residuals.max() < 1e-3

    out = refine_dw(p32, res32.eigenvectors, tol=1e-8)
    assert out.converged, f"residuals {out.residuals}"

    # independent f64 oracle on the returned vectors (padded back to the
    # pencil's layout)
    X = jnp.zeros(
        (p64.n_padded, out.eigenvectors.shape[1]), jnp.float64
    ).at[: p64.n].set(jnp.asarray(out.eigenvectors, jnp.float64))
    KX = np.asarray(p64.K_mm(X))[: p64.n]
    MX = np.asarray(p64.M_mm(X))[: p64.n]
    th = out.eigenvalues
    R = KX - MX * th[None, :]
    scale = np.linalg.norm(KX, axis=0) + np.abs(th) * np.linalg.norm(
        MX, axis=0
    )
    rel = np.linalg.norm(R, axis=0) / scale
    assert rel.max() <= 2e-8, f"f64-verified residual {rel.max():.2e}"
    # eigenvalue parity with the analytic spectrum at h^2 accuracy
    from maxwell_tpu.problems.analytic import cavity_eigenvalues_3d

    ana = cavity_eigenvalues_3d(1.0, 1.0, 1.0, 5)
    np.testing.assert_allclose(np.sort(th), ana, rtol=0.05)


def test_refine_dw_loaded_cavity():
    """Round-4 loaded-cavity extension: dielectric PEC pencil refines to
    1e-8 ON DEVICE via dw ftaps residuals + preconditioned block MINRES
    corrections (vacuum spectral solve as SPD preconditioner)."""
    from maxwell_tpu.solvers import lobpcg
    from maxwell_tpu.solvers.refine_device import refine_dw
    from maxwell_tpu.solvers.spectral import spectral_preconditioner

    n = 8
    eps = np.ones((n, n, n))
    eps[: n // 2] = 2.5
    p32 = StencilPencil3D.build(
        nx=n, ny=n, nz=n, dtype=jnp.float32, eps_r=eps
    )
    p64 = StencilPencil3D.build(
        nx=n, ny=n, nz=n, dtype=jnp.float64, eps_r=eps
    )
    pc = spectral_preconditioner(p32, alpha=12.0)
    res32 = lobpcg(
        p32, nev=4, maxiter=120, tol=1e-5, precond=pc, stall_window=12
    )
    assert res32.residuals.max() < 1e-3

    out = refine_dw(p32, res32.eigenvectors, tol=1e-8)
    assert out.converged, f"residuals {out.residuals}"

    X = jnp.zeros(
        (p64.n_padded, out.eigenvectors.shape[1]), jnp.float64
    ).at[: p64.n].set(jnp.asarray(out.eigenvectors, jnp.float64))
    KX = np.asarray(p64.K_mm(X))[: p64.n]
    MX = np.asarray(p64.M_mm(X))[: p64.n]
    th = out.eigenvalues
    R = KX - MX * th[None, :]
    scale = np.linalg.norm(KX, axis=0) + np.abs(th) * np.linalg.norm(
        MX, axis=0
    )
    rel = np.linalg.norm(R, axis=0) / scale
    assert rel.max() <= 2e-8, f"f64-verified residual {rel.max():.2e}"


def test_device_resident_chain(pencils):
    """Round-4 VERDICT item 1: lobpcg(return_device=True) hands the
    PADDED device block straight to refine_dw, which with
    return_device=True keeps the refined dw pair in HBM — the whole road
    to 1e-8 without a host round-trip. The fetched-afterwards vectors
    must match the host-path quality against the independent f64 pencil."""
    from maxwell_tpu.solvers import lobpcg
    from maxwell_tpu.solvers.refine_device import refine_dw
    from maxwell_tpu.solvers.spectral import spectral_preconditioner
    from maxwell_tpu.utils import twofloat as tf

    p32, p64 = pencils
    pc = spectral_preconditioner(p32, alpha=15.0)
    res32 = lobpcg(
        p32, nev=5, maxiter=60, tol=1e-5, precond=pc, stall_window=10,
        return_device=True,
    )
    assert isinstance(res32.eigenvectors, jax.Array)
    assert res32.eigenvectors.shape == (p32.n_padded, 5)

    out = refine_dw(p32, res32.eigenvectors, tol=1e-8, return_device=True)
    assert out.converged, f"residuals {out.residuals}"
    Xh, Xl = out.eigenvectors
    assert isinstance(Xh, jax.Array) and Xh.shape == (p32.n_padded, 5)

    # explicit fetch (what a consumer wanting host vectors would do)
    X64 = tf.dw_to_f64(np.asarray(Xh), np.asarray(Xl))
    X = jnp.asarray(X64, jnp.float64)
    KX = np.asarray(p64.K_mm(X))[: p64.n]
    MX = np.asarray(p64.M_mm(X))[: p64.n]
    th = out.eigenvalues
    R = KX - MX * th[None, :]
    scale = np.linalg.norm(KX, axis=0) + np.abs(th) * np.linalg.norm(
        MX, axis=0
    )
    rel = np.linalg.norm(R, axis=0) / scale
    assert rel.max() <= 2e-8, f"f64-verified residual {rel.max():.2e}"


def test_refine_dw_early_exit_sweep_count(pencils):
    """The while_loop early exit (round-4 VERDICT item 5) takes FEWER
    sweeps than the cap when the block converges fast, and the reported
    iteration count reflects the executed sweeps."""
    from maxwell_tpu.solvers import lobpcg
    from maxwell_tpu.solvers.refine_device import refine_dw
    from maxwell_tpu.solvers.spectral import spectral_preconditioner

    p32, _ = pencils
    pc = spectral_preconditioner(p32, alpha=15.0)
    res32 = lobpcg(
        p32, nev=5, maxiter=60, tol=1e-5, precond=pc, stall_window=10
    )
    out = refine_dw(p32, res32.eigenvectors, tol=1e-8)
    # exact sweeps contract ~3 digits each from the f32 floor (~1e-5
    # here): 2-3 sweeps + the final RR, never the full 5-sweep cap
    assert out.converged
    assert out.iterations <= 4, (
        f"early exit did not fire: {out.iterations} iterations"
    )

"""Operator abstraction consumed by all solvers (SURVEY.md §1: L5 consumes
L3/L4 through an abstract operator apply — the Epetra/Anasazi-style contract,
rebuilt as JAX pytrees so one SPMD program serves any device count).

A `Pencil` bundles the stiffness K, mass M, and the gradient-nullspace
projector as a pytree; solvers receive it as a traced jit argument (its
arrays are never baked into the compiled program as constants) and call its
methods, which dispatch to the configured SpMV/SpMM kernel implementation
("ref" = pure-jnp einsum, "pallas" = maxwell_tpu.kernels).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from maxwell_tpu.sparse.bsr import BSRMatrix, bsr_matmat_ref
from maxwell_tpu.solvers.cg import cg
from maxwell_tpu.solvers.deflation import GradientProjector


def _dispatch_matmat(kernel: str) -> Callable:
    if kernel == "ref":
        return bsr_matmat_ref
    if kernel == "pallas":
        from maxwell_tpu.kernels.spmm import bsr_matmat_pallas

        return bsr_matmat_pallas
    raise ValueError(f"unknown kernel {kernel!r}")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Pencil:
    """The matrix pencil (K, M) plus nullspace projector.

    M may be None (standard eigenproblem; mass = identity).
    proj may be None (no nullspace deflation).
    kernel: static — which SpMM implementation to use.
    """

    K: BSRMatrix
    M: BSRMatrix | None = None
    proj: GradientProjector | None = None
    kernel: str = "ref"
    mass_tol: float = 1e-12
    mass_iters: int = 300
    # exact tensor-product nodal solver for the projector (vacuum PEC brick
    # problems; round-1 VERDICT item 4): replaces the projector's ~100-CG
    # inner loop with six dense 1D transforms on the MXU
    fastproj: "object | None" = None
    # kernel="union" (production TPU path): K holds a BELLUnion carrying
    # BOTH value streams (vals = K, vals_b = M on the union pattern) and
    # Kbanded its row-band split for X beyond the VMEM budget; M stays
    # None. Measured at ~70% of the HBM roofline on the chip vs <20% for
    # per-block-row formulations (kernels/spmm.py, bench/exp_union.py).
    # kernel="bellpairs" keeps the superseded paired-chunk layout wired
    # for comparison.
    Kbanded: "object | None" = None
    # union-kernel dot precision: "highest" (six f32 MXU passes) or "b3"
    # (three bf16 passes over build-time split value streams — the
    # PRODUCTION f32 mode since round 5: 1.4-1.5x faster at ~1e-5 max
    # apply error, below the f32 solve floors; kernels/spmm.py
    # _bellunion_kernel_b3). Banded fallback applies stay "highest".
    precision: str = "highest"

    def tree_flatten(self):
        return (self.K, self.M, self.proj, self.fastproj, self.Kbanded), (
            self.kernel,
            self.mass_tol,
            self.mass_iters,
            self.precision,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        K, M, proj, fastproj, Kbanded = children
        return cls(
            K=K, M=M, proj=proj, fastproj=fastproj, Kbanded=Kbanded,
            kernel=aux[0], mass_tol=aux[1], mass_iters=aux[2],
            precision=aux[3] if len(aux) > 3 else "highest",
        )

    # --- shapes -----------------------------------------------------------
    @property
    def n(self) -> int:
        return self.K.n

    @property
    def n_padded(self) -> int:
        return self.K.n_padded

    @property
    def dtype(self):
        if self.kernel == "union":
            return self.K.vals.dtype
        if self.kernel == "bellpairs":
            return self.K.vals2d.dtype
        return self.K.blocks.dtype

    # --- reductions (overridden with psum variants by DistPencil) ---------
    def weigh(self, x: jax.Array) -> jax.Array:
        """Row ownership weights for inner products. Identity here; sharded
        operators with REPLICATED interface rows (e.g. the slab-sharded
        stencil pencil) override this to zero the non-owned copies so
        global reductions count each DOF once."""
        return x

    def dot_mm(self, A: jax.Array, B: jax.Array) -> jax.Array:
        """(m, k) <- A^T B over the row axis — THE cross-device reduction
        of Gram/RR matrices (psum over ICI in the distributed pencil,
        SURVEY.md §2 C7)."""
        return A.T @ self.weigh(B)

    def dot_cols(self, A: jax.Array, B: jax.Array) -> jax.Array:
        """(m,) <- column-wise inner products."""
        return jnp.sum(A * self.weigh(B), axis=0)

    def dot_vv(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return jnp.vdot(x, self.weigh(y))

    def reduce_rows(self, v: jax.Array) -> jax.Array:
        """Finish a partial row-contraction (identity on one device)."""
        return v

    def col_norms(self, A: jax.Array) -> jax.Array:
        return jnp.sqrt(jnp.maximum(self.dot_cols(A, A), 0.0))

    # --- applies (padded in, padded out) ----------------------------------
    def _bell_fits_vmem(self, m: int) -> bool:
        # lane-padded model (round 5): an (n, m<=128) f32 X costs
        # n*128*4 VMEM bytes regardless of m (kernels/spmm.x_fits_vmem)
        from maxwell_tpu.kernels.spmm import x_fits_vmem

        return x_fits_vmem(self.n_padded + self.K.b, m)

    def _bell_mm(self, X: jax.Array, stream: str) -> jax.Array:
        if self.kernel == "union":
            from maxwell_tpu.kernels.spmm import (
                bellunion_matmat_banded as banded,
                bellunion_matmat_pallas as full,
            )
        else:
            from maxwell_tpu.kernels.spmm import (
                bellpairs_matmat_banded as banded,
                bellpairs_matmat_pallas as full,
            )

        vec = X.ndim == 1
        Xl = X[:, None] if vec else X
        if self._bell_fits_vmem(Xl.shape[1]):
            if self.kernel == "union":
                Y = full(
                    self.K, Xl, stream=stream, precision=self.precision
                )
            else:
                Y = full(self.K, Xl, stream=stream)
        elif self.Kbanded is not None:
            if self.kernel == "union":
                Y = banded(
                    self.Kbanded, Xl, stream=stream,
                    precision=self.precision,
                )
            else:
                Y = banded(self.Kbanded, Xl, stream=stream)
        else:
            raise ValueError(
                "X exceeds the VMEM budget and no banded split was built "
                "(raise max_m in Pencil.from_problem)"
            )
        return Y[:, 0] if vec else Y

    def K_mm(self, X: jax.Array) -> jax.Array:
        if self.kernel in ("bellpairs", "union"):
            return self._bell_mm(X, "a")
        mm = _dispatch_matmat(self.kernel)
        vec = X.ndim == 1
        Y = mm(self.K, X[:, None] if vec else X)
        return Y[:, 0] if vec else Y

    def M_mm(self, X: jax.Array) -> jax.Array:
        if self.kernel in ("bellpairs", "union"):
            return self._bell_mm(X, "b")
        if self.M is None:
            return X
        mm = _dispatch_matmat(self.kernel)
        vec = X.ndim == 1
        Y = mm(self.M, X[:, None] if vec else X)
        return Y[:, 0] if vec else Y

    def KM_mm(self, X: jax.Array):
        """(K @ X, M @ X); DistPencil overrides with collective fencing.

        kernel="bellpairs"/"union": ONE fused kernel — X gathered once
        per chunk, contracted against both value streams; the per-chunk
        fixed costs (SMEM reads, gather, output RMW — the non-value-byte
        15-35% of a single-stream call) are paid once instead of twice
        (round 4)."""
        if self.kernel == "bellpairs":
            from maxwell_tpu.kernels.spmm import (
                bellpairs_km_matmat_banded,
                bellpairs_km_matmat_pallas,
            )

            vec = X.ndim == 1
            Xl = X[:, None] if vec else X
            if self._bell_fits_vmem(Xl.shape[1]):
                Yk, Ym = bellpairs_km_matmat_pallas(self.K, Xl)
            elif self.Kbanded is not None:
                Yk, Ym = bellpairs_km_matmat_banded(self.Kbanded, Xl)
            else:
                raise ValueError(
                    "X exceeds the VMEM budget and no banded split was built"
                )
            return (Yk[:, 0], Ym[:, 0]) if vec else (Yk, Ym)
        if (
            self.kernel == "union"
            and getattr(self.K, "vals_b", None) is not None
        ):
            from maxwell_tpu.kernels.spmm import bellunion_km_matmat_pallas

            vec = X.ndim == 1
            Xl = X[:, None] if vec else X
            if self._bell_fits_vmem(Xl.shape[1]):
                Yk, Ym = bellunion_km_matmat_pallas(
                    self.K, Xl, precision=self.precision
                )
                return (Yk[:, 0], Ym[:, 0]) if vec else (Yk, Ym)
            # banded fallback: two single-stream banded applies
        return self.K_mm(X), self.M_mm(X)

    def Minv_mm(self, X: jax.Array) -> jax.Array:
        """M^-1 X via CG (mass matrices are well-conditioned).

        kernel="union"/"bellpairs" pencils always store the mass matrix as
        K's second value stream (M is None by construction), so the
        M-is-None identity shortcut applies ONLY to the BSR kernels —
        otherwise Lanczos direct mode would silently solve K instead of
        M^-1 K (round-2 advisor finding, high)."""
        if self.kernel not in ("bellpairs", "union") and self.M is None:
            return X
        return cg(
            self.M_mm,
            X,
            tol=self.mass_tol,
            maxiter=self.mass_iters,
            dot=self.dot_cols,
        )

    def project(self, X: jax.Array) -> jax.Array:
        """M-orthogonal projection off the gradient nullspace (no-op if
        the pencil has no projector)."""
        if self.proj is None:
            return X
        if self.fastproj is not None:
            vec = X.ndim == 1
            Xl = X[:, None] if vec else X
            rhs = self.proj.gt_mm(self.M_mm(Xl))
            out = Xl - self.proj.g_mm(self.fastproj.solve(rhs))
            return out[:, 0] if vec else out
        return self.proj.project(self.M_mm, X)

    # --- host-side constructors ------------------------------------------
    @staticmethod
    def from_problem(
        problem,
        block: int | None = None,
        kernel: str = "ref",
        dtype=jnp.float32,
        max_m: int = 96,
        precision: str = "auto",
    ) -> "Pencil":
        """Build from a cavity problem (RectCavity2D / BrickCavity3D).

        block default: layout study (round-1 log) — b=4 with tight slot
        alignment stores ~2.7x fewer padded bytes and is the fastest
        memory-bound einsum layout; the Pallas kernels want lane-aligned
        b=8 tiles.
        """
        if block is None:
            block = 8 if kernel in ("pallas", "bellpairs", "union") else 4
        Kbanded = None
        if kernel in ("bellpairs", "union"):
            from maxwell_tpu.kernels.spmm import (
                _VMEM_X_BUDGET,
                _VMEM_X_LANE_BUDGET,
                x_fits_vmem,
            )

            if kernel == "union":
                from maxwell_tpu.sparse.bellunion import BELLUnion as _Layout

                # HOST-FIRST build: the banded split below slices the
                # value arrays on the host — building on device first
                # forced a device->host fetch of the full streams
                # (measured 531 s for 4.8 GB over the ~2 MB/s axon
                # download direction at 48^3); host-first, the values
                # cross the tunnel once, in the fast upload direction
                K = _Layout.from_csr(
                    problem.K, block=block, dtype=dtype, B=problem.M,
                    to_device=False,
                )
            else:
                from maxwell_tpu.sparse.bellpairs import BELLPairs as _Layout

                K = _Layout.from_csr(
                    problem.K, block=block, dtype=dtype, B=problem.M
                )
            from maxwell_tpu.kernels.spmm import x_fits_vmem as _xfits

            if precision == "auto":
                # PRODUCTION f32 union mode: bf16x3 split streams
                # (round 5; see the `precision` field note). Banded-routed
                # sizes (full X beyond the lane-padded VMEM budget) stay
                # "highest": carrying f32 + bf16 splits for BOTH the full
                # streams and the band copies exceeds HBM at 48^3
                # (measured OOM at ~19 GB of value storage).
                precision = (
                    "b3"
                    if kernel == "union"
                    and dtype == jnp.float32
                    and _xfits(K.n_padded + block, 8)
                    else "highest"
                )
            if precision == "b3" and kernel == "union":
                K = K.bf16x3()  # host-side split (ml_dtypes)
            M = None
            # band split sized for the LARGEST width the solvers can
            # request (LOBPCG's [X, W, P] basis is 3*m_block, <= max_m),
            # built whenever ANY width up to max_m would overflow VMEM —
            # a width between 32 and max_m must never hit the "no banded
            # split" runtime error (round-2 advisor finding, medium).
            # Duplicates value storage; only built if needed.
            if not x_fits_vmem(K.n_padded + block, max_m):
                # window budget in the builder's raw-bytes terms, derived
                # from the REAL lane-padded constraint: window rows cap =
                # lane budget / (128 lanes * 4 B), with 5/6 headroom
                rows_cap = _VMEM_X_LANE_BUDGET // (128 * 4) * 5 // 6
                Kbanded = K.banded(
                    m=max_m,
                    budget_bytes=rows_cap * max_m * 4,
                    split_bf16=(precision == "b3" and kernel == "union"),
                )
            if kernel == "union":
                K = K.to_device()
        else:
            align = None if kernel == "pallas" else 4
            K = BSRMatrix.from_csr(
                problem.K, block=block, align_slots=align, dtype=dtype
            )
            M = BSRMatrix.from_csr(
                problem.M, block=block, align_slots=align, dtype=dtype
            )
        proj = GradientProjector.from_gradient(problem.G, K.n_padded, dtype=dtype)
        # exact tensor-product projector solve for vacuum PEC bricks — the
        # base problem's interior-node order (i-major, k-fastest, matching
        # cavity3d's meshgrid) is exactly FastPoisson3D's layout, and row
        # permutations (PermutedProblem) don't touch the NODE space, so the
        # fast solve stays valid for RCM-reordered pencils too.
        fastproj = None
        base = getattr(problem, "base", problem)
        if (
            getattr(base, "nz", None) is not None
            and getattr(base, "bc", "pec") == "pec"
            and getattr(base, "eps_r", None) is None
            and getattr(base, "mu_r", None) is None
        ):
            from maxwell_tpu.solvers.fast_poisson import FastPoisson3D

            fastproj = FastPoisson3D.build(
                base.a, base.b, base.c, base.nx, base.ny, base.nz,
                dtype=dtype,
            )
        if precision == "auto":
            precision = "highest"
        return Pencil(
            K=K, M=M, proj=proj, kernel=kernel, fastproj=fastproj,
            Kbanded=Kbanded, precision=precision,
        )

"""maxwell_tpu — a TPU-native sparse eigensolver framework.

A from-scratch re-design of the capabilities of the reference ``bauerca/maxwell``
(C++/MPI edge-element cavity eigensolver; see SURVEY.md) for TPU hardware:

- Matrix storage: tiled block-sparse-row (BSR) in HBM with MXU-aligned blocks
  (reference: Epetra-style CSR — SURVEY.md §2 C3).
- SpMV/SpMM: Pallas kernels streaming BSR blocks through VMEM
  (reference: MPI rank loops — SURVEY.md §2 C4/C5).
- Orthogonalization: batched dense QR / CholQR on the MXU
  (reference: LAPACK — SURVEY.md §2 C6).
- Eigensolvers: Lanczos (plain + shift-invert) and LOBPCG written once as
  jit-ed SPMD loops over an abstract operator; device count is a mesh
  property, not a code path (reference: MPI driver loops — SURVEY.md §2
  C9/C11/C14).
- Distribution: block-row sharding over a ``jax.sharding.Mesh`` with
  ``shard_map``; halo exchange via ``ppermute``/remote-DMA and reductions via
  ``psum`` over ICI (reference: MPI p2p + Allreduce — SURVEY.md §2 C8/C14).

The reference mount was empty at survey time (SURVEY.md §0), so reference
citations throughout this package point at SURVEY.md / BASELINE.json rather
than reference file:line.
"""

__version__ = "0.1.0"

from maxwell_tpu.sparse.bsr import BSRMatrix  # noqa: F401
from maxwell_tpu.solvers.results import EigenResult  # noqa: F401
from maxwell_tpu.api import solve  # noqa: F401

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


def _enable_persistent_compile_cache():
    """Persistent XLA compilation cache (round-3 VERDICT item 3).

    The 64^3 LOBPCG loop costs ~127 s to compile cold on the chip;
    measured over the axon tunnel, a cache hit replays the executable in
    ~0.06 s — so the compile is a one-time cost per (machine, shape)
    rather than per process. Opt out with MAXWELL_TPU_NO_COMPILE_CACHE=1;
    relocate with MAXWELL_TPU_CACHE_DIR.
    """
    import os

    if os.environ.get("MAXWELL_TPU_NO_COMPILE_CACHE"):
        return
    path = os.environ.get("MAXWELL_TPU_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "maxwell_tpu", "jax_cache"
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

from maxwell_tpu.sparse.bsr import BSRMatrix  # noqa: F401
from maxwell_tpu.solvers.results import EigenResult  # noqa: F401
from maxwell_tpu.api import solve  # noqa: F401

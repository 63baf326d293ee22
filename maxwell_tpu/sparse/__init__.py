"""Sparse matrix storage: tiled BSR (blocked-ELL) containers for HBM, host
CSR->BSR conversion, and jnp reference SpMV/SpMM (SURVEY.md §2 C3).
"""

from maxwell_tpu.sparse.bsr import BSRMatrix  # noqa: F401

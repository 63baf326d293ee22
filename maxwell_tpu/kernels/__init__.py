"""Device kernels: Pallas BSR SpMV/SpMM, level-scheduled sparse triangular
solves, and batched orthogonalization primitives (SURVEY.md §2 C4/C5/C6/C10).
"""

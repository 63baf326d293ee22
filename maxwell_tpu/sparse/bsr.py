"""Tiled BSR ("blocked-ELL") sparse matrix storage for TPU HBM.

TPU-native replacement for the reference's Epetra-style CSR (SURVEY.md §2 C3;
BASELINE.json: "Epetra-style CSR -> tiled BSR in HBM"). Design rationale
(SURVEY.md §7.4):

- TPUs have no efficient scalar gather; CSR rank-loops are hostile to the
  hardware. Dense b x b blocks turn SpMV/SpMM into streams of small matmuls.
- Each block-row stores a FIXED number S of blocks (ELL padding, "pad don't
  branch"): values have static shape (n_brows, S, b, b) and block-column
  indices (n_brows, S) int32. Padding entries point at block-column 0 with
  all-zero values, so no masking is needed on the compute path.
- The per-block-row contraction y_r = sum_s B[r,s] @ X[cols[r,s]] is expressed
  as one (b, S*b) @ (S*b, m) matmul; with b=8, S a multiple of 16, the
  contraction dimension S*b is a multiple of 128 — exactly MXU-shaped.

The logical dimension n is zero-padded up to n_brows*b. Padded rows/cols are
all-zero in the values, so vectors whose padding entries are zero stay
zero-padded under matvec and linear combinations — solvers rely on this
invariant instead of masking (see maxwell_tpu/solvers/).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def ensure_x64_for(dtype) -> None:
    """Enable jax x64 when a 64-bit dtype is requested — otherwise
    jnp.asarray silently truncates to f32 and 'f64' workflows run in f32
    (review finding, round 1)."""
    if np.dtype(dtype).itemsize == 8:
        import jax

        jax.config.update("jax_enable_x64", True)  # idempotent


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _window_metadata(blocks_np: np.ndarray, cols_np: np.ndarray, b: int):
    """Per-tile aligned X-window metadata for the windowed Pallas kernel.

    Tile = R block rows (R*b = 128). win_unit W_u = the max per-tile column
    span; window starts are aligned DOWN to W_u so the kernel can fetch two
    adjacent (W_u*b)-row panels of X through the standard BlockSpec pipeline
    (offsets are multiples of the block shape). Narrow windows require a
    bandwidth-reduced ordering (sparse/reorder.py).
    Returns (win_start (n_tiles,), cols_rel (nbr, S), W_u) or (None, None, 0).
    """
    R = max(128 // b, 1)
    nbr, S = cols_np.shape
    if nbr % R != 0 or nbr == 0:
        return None, None, 0
    n_tiles = nbr // R
    nz = np.abs(blocks_np).max(axis=(2, 3)) > 0  # (nbr, S)
    cols_t = cols_np.reshape(n_tiles, R * S)
    nz_t = nz.reshape(n_tiles, R * S)
    big = np.where(nz_t, cols_t, np.iinfo(np.int32).max)
    small = np.where(nz_t, cols_t, -1)
    cmin = np.minimum(big.min(axis=1), nbr - 1)  # empty tiles -> clamp
    cmax = small.max(axis=1)
    span = np.maximum(cmax - cmin + 1, 1)
    W_u = int(span.max())
    aligned = (cmin // W_u).astype(np.int32)  # in W_u units
    # relative columns; padding (zero) blocks clamp to 0
    aligned_per_row = np.repeat(aligned, R)  # (nbr,)
    rel = cols_np - aligned_per_row[:, None] * W_u
    rel = np.where(nz, rel, 0).astype(np.int32)
    if rel.min() < 0 or (rel[nz] >= 2 * W_u).any():
        return None, None, 0
    return aligned, rel, W_u


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BSRMatrix:
    """Blocked-ELL sparse matrix.

    Attributes:
      blocks: (n_brows, S, b, b) float array — dense blocks, zero-padded.
      cols:   (n_brows, S) int32 — block-column index per slot (0 for padding).
      n:      logical square dimension (rows = cols = n).
    """

    blocks: jax.Array
    cols: jax.Array
    n: int
    # windowed-kernel metadata (optional; filled by from_csr). win_start:
    # (n_tiles,) int32 aligned window index per R-block-row tile; cols_rel:
    # (n_brows, S) int32 columns relative to the tile's aligned window start;
    # win_unit: window unit in block rows (aux). See kernels/spmm.py.
    win_start: jax.Array | None = None
    cols_rel: jax.Array | None = None
    win_unit: int = 0

    # --- pytree plumbing -------------------------------------------------
    def tree_flatten(self):
        return (self.blocks, self.cols, self.win_start, self.cols_rel), (
            self.n,
            self.win_unit,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        blocks, cols, win_start, cols_rel = children
        return cls(
            blocks=blocks, cols=cols, n=aux[0],
            win_start=win_start, cols_rel=cols_rel, win_unit=aux[1],
        )

    # --- derived shapes --------------------------------------------------
    @property
    def b(self) -> int:
        return self.blocks.shape[-1]

    @property
    def n_brows(self) -> int:
        return self.blocks.shape[0]

    @property
    def slots(self) -> int:
        return self.blocks.shape[1]

    @property
    def n_padded(self) -> int:
        return self.n_brows * self.b

    @property
    def nnz_dense(self) -> int:
        """Stored (dense-block) entry count — the bandwidth-relevant nnz."""
        return self.blocks.size

    # --- construction ----------------------------------------------------
    @staticmethod
    def from_csr(
        A: sp.spmatrix,
        block: int = 8,
        align_slots: int | None = None,
        dtype=jnp.float32,
        row_align: int | None = None,
    ) -> "BSRMatrix":
        """Convert a scipy sparse matrix to blocked-ELL.

        align_slots: round the slot count S up to this multiple (default:
        chosen so S*b is a multiple of 128, MXU-aligning the contraction).
        row_align: round the block-row count up to this multiple (default:
        one 128-row Pallas tile; pass n_shards * tile so the matrix splits
        evenly into shards — SURVEY.md §2 C15).
        """
        ensure_x64_for(dtype)
        A = sp.csr_matrix(A)
        n = A.shape[0]
        if A.shape[0] != A.shape[1]:
            raise ValueError("square matrices only")
        b = block
        if row_align is None:
            row_align = max(128 // b, 1)
        n_pad = _round_up(max(n, 1), b)
        n_brows = _round_up(n_pad // b, row_align)
        n_pad = n_brows * b
        if align_slots is None:
            align_slots = max(128 // b, 1)

        A_pad = sp.csr_matrix((A.data, A.indices, A.indptr), shape=(n, n))
        A_pad.resize((n_pad, n_pad))

        # fast path: native C++ converter (maxwell_tpu/native)
        try:
            from maxwell_tpu import native

            have_native = native.HAVE_NATIVE
        except Exception:
            have_native = False
        if have_native:
            # exact blocks/row via a 1-D integer-key unique (fast; the
            # 2-column np.unique(axis=0) variant is an order of magnitude
            # slower on large nnz)
            brow = np.repeat(
                np.arange(n_pad, dtype=np.int64) // b, np.diff(A_pad.indptr)
            )
            key = brow * np.int64(n_brows + 1) + (
                A_pad.indices.astype(np.int64) // b
            )
            uniq = np.unique(key)
            per_row = (
                np.bincount(
                    (uniq // np.int64(n_brows + 1)).astype(np.int64),
                    minlength=n_brows,
                )
                if uniq.size
                else np.zeros(n_brows, dtype=np.int64)
            )
            S = max(
                _round_up(max(int(per_row.max()) if len(per_row) else 1, 1), align_slots),
                align_slots,
            )
            blocks, cols, _ = native.bell_from_csr(
                A_pad.indptr, A_pad.indices, A_pad.data, n_pad, b, S
            )
            ws, rel, wu = _window_metadata(blocks, cols, b)
            return BSRMatrix(
                blocks=jnp.asarray(blocks, dtype=dtype),
                cols=jnp.asarray(cols),
                n=n,
                win_start=None if ws is None else jnp.asarray(ws),
                cols_rel=None if rel is None else jnp.asarray(rel),
                win_unit=wu,
            )

        # fallback: scipy BSR + python packing
        Ab = A_pad.tobsr(blocksize=(b, b))
        Ab.sort_indices()
        indptr, indices, data = Ab.indptr, Ab.indices, Ab.data

        per_row = np.diff(indptr)
        S = int(per_row.max()) if per_row.size else 1
        S = max(_round_up(max(S, 1), align_slots), align_slots)

        blocks = np.zeros((n_brows, S, b, b), dtype=np.dtype(dtype))
        cols = np.zeros((n_brows, S), dtype=np.int32)
        for r in range(n_brows):
            lo, hi = indptr[r], indptr[r + 1]
            k = hi - lo
            blocks[r, :k] = data[lo:hi]
            cols[r, :k] = indices[lo:hi]
        ws, rel, wu = _window_metadata(blocks, cols, b)
        return BSRMatrix(
            blocks=jnp.asarray(blocks, dtype=dtype),
            cols=jnp.asarray(cols),
            n=n,
            win_start=None if ws is None else jnp.asarray(ws),
            cols_rel=None if rel is None else jnp.asarray(rel),
            win_unit=wu,
        )

    def to_csr(self) -> sp.csr_matrix:
        """Round-trip back to scipy CSR (testing)."""
        b, S, nbr = self.b, self.slots, self.n_brows
        blocks = np.asarray(self.blocks)
        cols = np.asarray(self.cols)
        indptr = np.arange(nbr + 1) * S
        A = sp.bsr_matrix(
            (blocks.reshape(-1, b, b), cols.ravel(), indptr),
            shape=(self.n_padded, self.n_padded),
        ).tocsr()
        A.eliminate_zeros()
        return A[: self.n, : self.n].tocsr()

    # --- vector packing ---------------------------------------------------
    def pad_vec(self, x: jax.Array) -> jax.Array:
        """Zero-pad a logical (n,) or (n, m) array to n_padded rows."""
        pad = self.n_padded - self.n
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    def unpad_vec(self, x: jax.Array) -> jax.Array:
        return x[: self.n]


# ---------------------------------------------------------------------------
# Reference (pure-jnp) SpMV / SpMM. The Pallas kernels in
# maxwell_tpu/kernels/ are drop-in replacements validated against these.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=())
def bsr_matmat_ref(A: BSRMatrix, X: jax.Array) -> jax.Array:
    """Y = A @ X for X of shape (n_padded, m). Pure-jnp blocked-ELL product.

    Gathers X block-rows per slot then contracts with one einsum; XLA lowers
    the gather to dynamic slices and fuses the contraction onto the MXU.
    """
    b = A.b
    # X may be TALLER than A's row space (halo-extended local buffers in the
    # distributed pencil); cols index into X's block rows.
    Xb = X.reshape(-1, b, X.shape[-1])  # (x_brows, b, m)
    Xg = Xb[A.cols]  # (nbr, S, b, m)
    # accumulate at (at least) input precision on the MXU
    acc = jnp.result_type(A.blocks.dtype, X.dtype)
    Y = jnp.einsum(
        "rsij,rsjm->rim", A.blocks, Xg,
        preferred_element_type=acc, precision=jax.lax.Precision.HIGHEST,
    )
    return Y.reshape(A.n_padded, -1)


def bsr_matvec_ref(A: BSRMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x for x of shape (n_padded,)."""
    return bsr_matmat_ref(A, x[:, None])[:, 0]

"""Dielectric-loaded 3D cavity: per-cell permittivity pulls modes down."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import maxwell_tpu
from maxwell_tpu.problems import BrickCavity3D

nx = ny = nz = 8
eps = np.ones((nx, ny, nz))
eps[: nx // 2] = 4.0  # half-filled dielectric slab

vacuum = maxwell_tpu.solve(BrickCavity3D(nx=nx, ny=ny, nz=nz), nev=3)
loaded = maxwell_tpu.solve(
    BrickCavity3D(nx=nx, ny=ny, nz=nz, eps_r=eps), nev=3,
    precond_alpha=10.0,
)
print("vacuum :", vacuum.eigenvalues)
print("loaded :", loaded.eigenvalues, "(lower — dielectric loading)")

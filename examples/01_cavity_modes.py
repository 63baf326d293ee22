"""Compute the lowest resonant modes of a vacuum rectangular cavity and
compare with the analytic spectrum pi^2 (m^2/a^2 + n^2/b^2)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import maxwell_tpu
from maxwell_tpu.problems import RectCavity2D

cav = RectCavity2D(a=1.0, b=0.7, nx=48, ny=34)
res = maxwell_tpu.solve(cav, nev=6, tol=1e-9)

print("computed:", res.eigenvalues)
print("analytic:", cav.analytic_eigenvalues(6))
print("rel err :", np.abs(res.eigenvalues - cav.analytic_eigenvalues(6))
      / cav.analytic_eigenvalues(6))

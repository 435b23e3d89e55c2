"""Golden solves via the reference's own vendored qpOASES.

Loads ``libqpoases_golden.so`` (built by ``tools/golden/build.sh`` from the
read-only reference tree — the exact active-set solver the reference
controller calls at SolverMPC.cpp:955-982, with Options::setToMPC and
nWSR=100) and exposes it through ctypes.  Used by the parity suite to turn
"matches an independent NumPy re-derivation" into "matches the actual
reference solver".

The reduced entry point also replicates the reference's swing-leg variable
elimination (SolverMPC.cpp:859-950): zero-bound z-rows mark their foot's 3
variables + 5 constraint rows for removal; the reduced QP is solved and
re-expanded with zeros.  Comparing it against our masked full-size solves
proves the mask formulation is exactly equivalent to the elimination.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_DEFAULT_LIB = os.path.join(_REPO, "tools", "golden", "libqpoases_golden.so")
_BUILD = os.path.join(_REPO, "tools", "golden", "build.sh")

_lib = None


def available() -> bool:
    """True if the golden library exists or can be built from the reference."""
    try:
        return load() is not None
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def load(path: Optional[str] = None) -> ctypes.CDLL:
    """Load (building on demand) the golden qpOASES library."""
    global _lib
    if _lib is not None:
        return _lib
    path = path or os.environ.get("QPM_GOLDEN_LIB", _DEFAULT_LIB)
    if not os.path.exists(path):
        subprocess.run([_BUILD, os.path.dirname(path)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(path)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    for name in ("qpm_golden_solve", "qpm_golden_solve_reduced"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp,
                       ctypes.c_int, dp, ip]
    _lib = lib
    return lib


def _as_c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float64))


def solve(H, g, A, lb, ub, nwsr: int = 100, reduced: bool = False):
    """Solve min 0.5 x'Hx + g'x  s.t. lb <= Ax <= ub with reference qpOASES.

    Note our assembled P/q already carry the reference's factor 2
    (qH = 2(B'SB + aI), qg = 2 B'S(...), SolverMPC.cpp:806-814) and qpOASES
    minimizes 0.5 x'Hx + g'x, exactly as the reference passes them.

    Returns (x, status, aux) where aux is nWSR used (full) or the reduced
    variable count (reduced).  status 0 == SUCCESSFUL_RETURN.
    """
    lib = load()
    H, g, A = _as_c(H), _as_c(g), _as_c(A)
    lb, ub = _as_c(lb), _as_c(ub)
    n, m = g.shape[0], lb.shape[0]
    assert H.shape == (n, n) and A.shape == (m, n) and ub.shape == (m,)
    x = np.zeros(n, dtype=np.float64)
    aux = ctypes.c_int(0)
    dp = ctypes.POINTER(ctypes.c_double)
    args = (n, m, H.ctypes.data_as(dp), g.ctypes.data_as(dp),
            A.ctypes.data_as(dp), lb.ctypes.data_as(dp),
            ub.ctypes.data_as(dp), nwsr, x.ctypes.data_as(dp),
            ctypes.byref(aux))
    fn = lib.qpm_golden_solve_reduced if reduced else lib.qpm_golden_solve
    status = fn(*args)
    return x, status, aux.value


def dense_constraint_matrix(F: np.ndarray, horizon: int) -> np.ndarray:
    """Materialize the reference's fmat (SolverMPC.cpp:657-665): the
    (20h, 12h) block-diagonal of the (5, 3) pyramid block, one block per
    (step, leg)."""
    F = np.asarray(F, dtype=np.float64)
    nb = horizon * 4
    A = np.zeros((nb * 5, nb * 3), dtype=np.float64)
    for i in range(nb):
        A[i * 5:(i + 1) * 5, i * 3:(i + 1) * 3] = F
    return A

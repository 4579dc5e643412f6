"""MultiVector <-> dense conversions (API-parity shims).

The reference moves between hp.MultiVector (list of distributed dl.Vectors)
and numpy (n, k) arrays via `hippyflow/utilities/mv_utilities.py:18-54`.
In this framework a multivector *is* a (n, k) array, so these are identity
reshapes kept so ported user code keeps working.
"""

from __future__ import annotations

import numpy as np


def mv_to_dense(mv) -> np.ndarray:
    """(n, k) array -> (n, k) numpy array."""
    return np.asarray(mv)


def mv_to_dense_local(mv) -> np.ndarray:
    return np.asarray(mv)


def dense_to_mv_local(arr, like=None):
    """(n, k) numpy array -> (n, k) multivector (identity)."""
    return np.asarray(arr)

"""Mesh serialization utilities.

TPU analog of the reference's `hippyflow/utilities/mesh_utils.py`
(`read_serial_write_parallel_mesh`, XDMF serial-read -> parallel-partition
rewrite): here a mesh is plain static data, so persistence is one npz and
"parallel partitioning" is a sharding decision made when dof arrays are
placed on the device mesh — there is nothing to rewrite.
"""

from __future__ import annotations

import numpy as np

from ..fem.mesh import Mesh2D


def save_mesh(mesh: Mesh2D, path: str) -> None:
    """Serialize a Mesh2D to an npz file."""
    np.savez_compressed(
        path,
        vertices=mesh.vertices,
        cells=mesh.cells,
        boundary_mask=mesh.boundary_mask,
        structured_shape=(
            np.asarray(mesh.structured_shape)
            if mesh.structured_shape is not None
            else np.zeros(0, dtype=np.int64)
        ),
    )


def load_mesh(path: str) -> Mesh2D:
    """Load a Mesh2D written by save_mesh."""
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    ss = data["structured_shape"]
    return Mesh2D(
        vertices=data["vertices"],
        cells=data["cells"],
        boundary_mask=data["boundary_mask"],
        structured_shape=tuple(int(v) for v in ss) if ss.size else None,
    )

"""Process grids over JAX device meshes.

Analog of ``superlu_gridinit`` / ``superlu_gridinit3d`` (reference:
SRC/prec-independent/superlu_grid.c:37-230, superlu_grid3d.c:16-280): the
reference splits an MPI communicator into row/column (and depth) scopes; here
the same topology is a ``jax.sharding.Mesh`` whose named axes ('r', 'c', and
'z' for the 3D grid) carry the collectives that replace rowcomm/colcomm/
zscope traffic (panel broadcasts → psum over a mesh axis, ancestor
reduction → psum over 'z').
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

R_AXIS = "r"
C_AXIS = "c"
Z_AXIS = "z"


class Grid2D:
    """Pr × Pc logical process grid (superlu_gridinit analog)."""

    def __init__(self, nprow: int, npcol: int,
                 devices: Optional[Sequence] = None):
        devices = list(devices) if devices is not None else jax.devices()
        if nprow * npcol > len(devices):
            raise ValueError(
                f"grid {nprow}x{npcol} needs {nprow*npcol} devices, "
                f"have {len(devices)}")
        dev = np.array(devices[: nprow * npcol]).reshape(nprow, npcol)
        self.nprow = nprow
        self.npcol = npcol
        self.mesh = Mesh(dev, (R_AXIS, C_AXIS))

    @property
    def shape(self):
        return (self.nprow, self.npcol)

    def __repr__(self):
        return f"Grid2D({self.nprow}x{self.npcol})"


class Grid3D:
    """Pz × Pr × Pc grid (superlu_gridinit3d analog).

    The 'z' axis is the communication-avoiding replication dimension: each
    z-layer factors an independent elimination-forest subtree; ancestors are
    replicated and psum-reduced across 'z' (the dreduceAllAncestors3d
    pattern, reference: SRC/double/pd3dcomm.c:964-1270).
    """

    def __init__(self, npdep: int, nprow: int, npcol: int,
                 devices: Optional[Sequence] = None):
        devices = list(devices) if devices is not None else jax.devices()
        need = npdep * nprow * npcol
        if need > len(devices):
            raise ValueError(
                f"grid {npdep}x{nprow}x{npcol} needs {need} devices, "
                f"have {len(devices)}")
        dev = np.array(devices[:need]).reshape(npdep, nprow, npcol)
        self.npdep = npdep
        self.nprow = nprow
        self.npcol = npcol
        self.mesh = Mesh(dev, (Z_AXIS, R_AXIS, C_AXIS))

    @property
    def shape(self):
        return (self.npdep, self.nprow, self.npcol)

    def __repr__(self):
        return f"Grid3D({self.npdep}x{self.nprow}x{self.npcol})"

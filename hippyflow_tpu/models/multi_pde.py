"""Multi-source PDE problems: shared parameter, independent states.

Port of `hippyflow/modeling/multiPDEProblem.py:21-141` (MultiPDEProblem),
`blockVector.py:20-96` (BlockVector) and
`multiStateLinearObservable.py:20-212` (MultiStateLinearObservable).

In jax a "block vector" over k same-shape states is simply a stacked (k, n)
array when the sub-problems share a space; for heterogeneous spaces it is a
tuple pytree.  The k sub-problems are solved in a python loop over the
(static) problem list — each sub-solve is itself batched/vmapped internally,
and k is small (number of sources).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pde_problem import Linearization, NewtonInfo, VariationalPDEProblem


class BlockVector:
    """Tuple-of-arrays block vector with the reference's axpy/zero/scale API
    (`blockVector.py:20-96`). Thin convenience for heterogeneous states."""

    def __init__(self, data):
        self.data = list(data)

    @property
    def nv(self):
        return len(self.data)

    def __getitem__(self, k):
        return self.data[k]

    def __setitem__(self, k, v):
        self.data[k] = v

    def zero(self):
        self.data = [jnp.zeros_like(d) for d in self.data]
        return self

    def axpy(self, a, other: "BlockVector"):
        self.data = [d + a * o for d, o in zip(self.data, other.data)]
        return self

    def scale(self, a):
        self.data = [a * d for d in self.data]
        return self

    def inner(self, other: "BlockVector"):
        return sum(jnp.vdot(d, o) for d, o in zip(self.data, other.data))

    def export(self, mesh, directory: str, name: str = "x") -> list[str]:
        """Write every sub-vector as a ParaView-readable legacy-VTK file
        ``<directory>/<name>_<k>.vtk`` (reference `blockVector.py:93-96`
        streams each snapshot into one dolfin .pvd collection; the file-
        per-snapshot series here opens identically in ParaView as a group).
        Returns the list of paths written."""
        import os

        from ..utils.mesh_utils import export_vtk

        os.makedirs(directory, exist_ok=True)
        return [
            export_vtk(
                os.path.join(directory, f"{name}_{k:04d}"),
                mesh,
                {name: d},
            )
            for k, d in enumerate(self.data)
        ]


class MultiPDEProblem:
    """k PDE problems sharing one parameter m (`multiPDEProblem.py:21-141`)."""

    def __init__(self, problems: list[VariationalPDEProblem]):
        assert len(problems) > 0
        self.problems = problems
        self.Vm = problems[0].Vm
        self.n_problems = len(problems)

    @property
    def has_control(self) -> bool:
        return False

    @property
    def Vu(self):
        return self.problems[0].Vu

    def generate_state(self):
        return jnp.stack([p.generate_state() for p in self.problems])

    def generate_parameter(self):
        return self.problems[0].generate_parameter()

    def solve_fwd(self, m, z=None, u0=None):
        us, infos = [], []
        for k, p in enumerate(self.problems):
            u0_k = u0[k] if u0 is not None else None
            u, info = p.solve_fwd(m, z=z, u0=u0_k)
            us.append(u)
            infos.append(info)
        info = NewtonInfo(
            converged=jnp.stack([i.converged for i in infos]).all(),
            iterations=jnp.stack([i.iterations for i in infos]).max(),
            residual_norm=jnp.stack([i.residual_norm for i in infos]).max(),
        )
        return jnp.stack(us), info

    def linearize(self, u, m, z=None, needs: str = "both"):
        lins = [
            p.linearize(u[k], m, z, needs=needs)
            for k, p in enumerate(self.problems)
        ]
        return lins

    def solve_incremental(self, lins, rhs, is_adj: bool = False):
        return jnp.stack(
            [
                p.solve_incremental(lin, rhs[k], is_adj=is_adj)
                for k, (p, lin) in enumerate(zip(self.problems, lins))
            ]
        )

    def apply_C(self, lins, dm):
        return jnp.stack(
            [p.apply_C(lin, dm) for p, lin in zip(self.problems, lins)]
        )

    def apply_Ct(self, lins, dps):
        out = None
        for k, (p, lin) in enumerate(zip(self.problems, lins)):
            c = p.apply_Ct(lin, dps[k])
            out = c if out is None else out + c
        return out


class MultiStateLinearObservable:
    """Observable for MultiPDEProblem: q = sum_k B_k u_k
    (`multiStateLinearObservable.py:103-127`)."""

    def __init__(self, multi_problem: MultiPDEProblem, Bs):
        if not isinstance(Bs, (list, tuple)):
            Bs = [Bs] * multi_problem.n_problems
        assert len(Bs) == multi_problem.n_problems
        self.problem = multi_problem
        self.Bs = list(Bs)
        self.is_control_problem = False

    @property
    def dQ(self):
        return self.Bs[0].dim

    @property
    def dM(self):
        return self.problem.Vm.dim

    def eval(self, m, z=None, u0=None):
        u, _ = self.problem.solve_fwd(m, z=z, u0=u0)
        return self.evalu(u)

    def evalu(self, u):
        q = None
        for k, B in enumerate(self.Bs):
            qk = B.apply(u[k])
            q = qk if q is None else q + qk
        return q

    def solve_fwd(self, m, z=None, u0=None):
        return self.problem.solve_fwd(m, z=z, u0=u0)

    def linearize(self, m, z=None, u=None, u0=None):
        if u is None:
            u, _ = self.problem.solve_fwd(m, z=z, u0=u0)
        return self.problem.linearize(u, m, z)

    def applyB(self, u):
        return self.evalu(u)

    def applyBt(self, q):
        return jnp.stack([B.applyt(q) for B in self.Bs])

    def applyC(self, lins, dm):
        return self.problem.apply_C(lins, dm)

    def applyCt(self, lins, dps):
        return self.problem.apply_Ct(lins, dps)

    def solveFwdIncremental(self, lins, rhs):
        return self.problem.solve_incremental(lins, rhs, is_adj=False)

    def solveAdjIncremental(self, lins, rhs):
        return self.problem.solve_incremental(lins, rhs, is_adj=True)

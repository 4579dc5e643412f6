"""Constrained Newton energy minimization.

Port of `hippyflow/modeling/cMinimization.py:42-207` (ConstrainedNSolver):
Newton's method with Armijo backtracking for linearly-constrained energy
minimization.  The energy and constraint are plain scalar jax functions of
the dof vector; gradient and Hessian come from jax AD (replacing FEniCS
`dl.derivative`), the Newton system is a dense factorization, and the
first-iteration constraint-violation pre-step of the reference
(`cMinimization.py:140-147`) is preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import DirichletBC, bc_symmetrize
from ..ops.linalg import factorize
from ..utils import ParameterList


def newtonSolver_ParameterList() -> ParameterList:
    """Mirrors `cMinimization.py:25-38`."""
    return ParameterList(
        {
            "max_iter": [20, "maximum Newton iterations"],
            "rel_tolerance": [1e-6, "converged when ||g||/||g0|| <= rtol"],
            "abs_tolerance": [1e-9, "converged when ||g|| <= atol"],
            "gdu_tolerance": [1e-18, "converged when (g, du) <= tol"],
            "c_armijo": [1e-4, "Armijo sufficient-decrease constant"],
            "max_backtracking_iter": [10, "line-search backtracks"],
            "print_level": [-1, "print if > 0"],
        }
    )


class ConstrainedNSolver:
    """Newton + Armijo for  min_u  F(u) + C(u)  with linear constraint C."""

    termination_reasons = [
        "Maximum number of Iteration reached",  # 0
        "Norm of the gradient less than tolerance",  # 1
        "Maximum number of backtracking reached",  # 2
        "Norm of (g, du) less than tolerance",  # 3
    ]

    def __init__(self, parameters: ParameterList | None = None):
        self.parameters = parameters or newtonSolver_ParameterList()
        self.it = 0
        self.converged = False
        self.reason = 0

    def solve(self, F, C, u0, constraint_vec, bc: DirichletBC | None = None):
        """Minimize L = F + C from initial guess u0.

        F, C: scalar functions of the dof vector (energy, constraint term).
        constraint_vec: direction used for the first-iteration constraint
        satisfaction check/correction.
        Returns (u, reason_index).
        """
        p = self.parameters
        max_iter = p["max_iter"]
        c_armijo = p["c_armijo"]
        max_bt = p["max_backtracking_iter"]
        prt = p["print_level"]

        L = lambda u: F(u) + C(u)
        grad_fn = jax.jit(jax.grad(L))
        hess_fn = jax.jit(jax.jacfwd(jax.grad(L)))
        F_jit = jax.jit(F)

        u = jnp.asarray(u0)
        if bc is not None:
            mask = jnp.asarray(bc.mask)
            u = jnp.where(mask, jnp.asarray(bc.value, dtype=u.dtype), u)

        Fn = float(F_jit(u))
        gn = grad_fn(u)
        g0_norm = float(jnp.linalg.norm(gn))
        gn_norm = g0_norm
        tol = max(g0_norm * p["rel_tolerance"], p["abs_tolerance"])
        cvec = jnp.asarray(constraint_vec)

        self.converged = False
        self.reason = 0
        for self.it in range(max_iter):
            gn = grad_fn(u)
            H = hess_fn(u)
            if bc is not None:
                H = bc_symmetrize(H, bc)
                gn = jnp.where(jnp.asarray(bc.mask), 0.0, gn)
            fac = factorize(H, symmetric=True)

            if self.it == 0:
                # first-iteration constraint-violation correction
                violation = gn * cvec
                if float(jnp.linalg.norm(violation)) > 1e-6:
                    du = -fac.solve(violation)
                    u = u + du
                    Fn = float(F_jit(u))
                    continue

            du = -fac.solve(gn)
            du_gn = float(jnp.dot(du, gn))
            alpha = 1.0
            if abs(du_gn) < p["gdu_tolerance"]:
                self.converged = True
                self.reason = 3
                u = u + alpha * du
                Fn = float(F_jit(u))
                gn_norm = float(jnp.linalg.norm(gn))
                break

            bk_converged = False
            for _ in range(max_bt):
                Fnext = float(F_jit(u + alpha * du))
                if Fnext < Fn + alpha * c_armijo * du_gn:
                    u = u + alpha * du
                    Fn = Fnext
                    bk_converged = True
                    break
                alpha /= 2.0
            if not bk_converged:
                self.reason = 2
                break

            gn_norm = float(jnp.linalg.norm(grad_fn(u)))
            if prt > 0:
                print(
                    f"{self.it + 1:3d} {Fn:15e} {gn_norm:15e} {du_gn:15e} {alpha:15e}"
                )
            if gn_norm < tol:
                self.converged = True
                self.reason = 1
                break

        self.it += 1
        if prt > 0:
            print(self.termination_reasons[self.reason])
        return u, self.reason

"""Faithful SparseBench iterative methods (golden-table semantics).

Ports of the reference solvers with their exact update order, residual
recording, and stopping rules, so the `reference_results` golden table
(iterations exact, residual ±5%) can be reproduced:

* sb_cg    — /root/reference/SparseBench/SRC/reference/iter_symm.f:18-117
             (hist(it) = ||r|| at loop top, r0 = A x0 - b, x -= alpha p)
* sb_gmres — /root/reference/SparseBench/SRC/reference/iter.f:106-290
             (modified Gram-Schmidt, bespoke QR update of the Hessenberg,
             est = err1*|q(1,it+1)| recorded per iteration, restart cycles)

Both are built for small validated sizes (maxit=10 in main_symm.f:25 /
the shipped validation runs): iterations are STATICALLY UNROLLED with a
`done` mask instead of device-side loops, which keeps every inner
Gram-Schmidt/QR loop static and lets XLA fuse the whole solve into one
executable. The general production solvers live in cg.py/bicg.py/gmres.py;
these exist to pin the framework to the reference's verification data.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def _norm(v):
    return jnp.sqrt(jnp.sum(v * v))


def sb_cg(
    matvec: Callable,
    b: jnp.ndarray,
    *,
    maxit: int,
    rtol: float,
    psolve: Optional[Callable] = None,
):
    """Returns (x, hist[maxit], its). hist entries beyond the stopping
    iteration stay 0 (what history_print skips); its < 0 means maxit hit
    without convergence (iter_symm.f:96 sign convention)."""
    n = b.shape[0]
    x = jnp.zeros(n, b.dtype)
    r = matvec(x) - b  # iter_symm.f:44-48 (note the sign)
    hist = jnp.zeros(maxit, b.dtype)
    p = jnp.zeros(n, b.dtype)
    rr_prev = jnp.asarray(1.0, b.dtype)
    rn0 = jnp.asarray(0.0, b.dtype)
    done = jnp.asarray(False)
    its = jnp.asarray(-maxit, jnp.int32)

    for it in range(1, maxit + 1):
        rn = _norm(r)
        hist = jnp.where(done, hist, hist.at[it - 1].set(rn))
        if it == 1:
            rn0 = rn
        conv = jnp.logical_and(~done, rn < rtol * rn0)
        its = jnp.where(conv, it, its)
        done = jnp.logical_or(done, conv)

        z = psolve(r) if psolve is not None else r
        rr = jnp.sum(r * z)
        if it == 1:
            p_new = z
        else:
            beta = rr / rr_prev
            p_new = z + beta * p
        ap = matvec(p_new)
        alpha = rr / jnp.sum(p_new * ap)
        x = jnp.where(done, x, x - alpha * p_new)
        r = jnp.where(done, r, r - alpha * ap)
        p = jnp.where(done, p, p_new)
        rr_prev = jnp.where(done, rr_prev, rr)
    return x, hist, its


def sb_gmres(
    matvec: Callable,
    b: jnp.ndarray,
    *,
    restart: int,
    maxit: int,
    tol: float,
    psolve: Optional[Callable] = None,
):
    """Returns (x, hist[maxit]). hist holds the per-iteration error estimate
    est = err1*|q(1,it+1)| (iter.f:232-233); entries after the stopping
    iteration stay 0. x0 = 0, rhs = b (main.f:341-345)."""
    n = b.shape[0]
    m = restart
    ncycles = maxit // restart + 1
    x = jnp.zeros(n, b.dtype)
    r = b - matvec(x)  # iter.f:140-142 (opposite sign from CG)
    err0 = _norm(r)
    hist = jnp.zeros(maxit, b.dtype)
    done = jnp.asarray(False)

    for cycle in range(1, ncycles + 1):
        err1 = _norm(r)
        V = jnp.zeros((m + 1, n), b.dtype)
        V = V.at[0].set(r / err1)
        H = jnp.zeros((m + 1, m + 1), b.dtype)
        Q = jnp.zeros((m + 1, m + 1), b.dtype)
        Uu = jnp.zeros((m + 1, m + 1), b.dtype)
        cycle_solution_applied = jnp.asarray(False)

        for it in range(1, m + 1):
            gidx = (cycle - 1) * restart + it
            if gidx > maxit:
                break
            w = V[it - 1]
            mv = psolve(w) if psolve is not None else w
            av = matvec(mv)
            # modified Gram-Schmidt (iter.f:171-183)
            for i in range(1, it + 1):
                s = jnp.sum(V[i - 1] * av)
                H = H.at[i - 1, it - 1].set(s)
                av = av - s * V[i - 1]
            hlast = _norm(av)
            H = H.at[it, it - 1].set(hlast)
            V = V.at[it].set(av / hlast)
            # QR column update (iter.f:192-210)
            for i in range(1, it):
                s = jnp.sum(Q[:i + 1, i - 1] * H[:i + 1, it - 1])
                Uu = Uu.at[i - 1, it - 1].set(s)
                H = H.at[: i + 1, it - 1].add(-s * Q[: i + 1, i - 1])
            udiag = jnp.sqrt(jnp.sum(H[: it + 1, it - 1] ** 2))
            Uu = Uu.at[it - 1, it - 1].set(udiag)
            Q = Q.at[: it + 1, it - 1].set(H[: it + 1, it - 1] / udiag)
            # orthonormal last column (iter.f:213-230)
            qcol = jnp.zeros(m + 1, b.dtype).at[0].set(1.0)
            for i in range(1, it + 1):
                s = jnp.sum(Q[:i, i - 1] * qcol[:i])
                qcol = qcol.at[: i + 1].add(-s * Q[: i + 1, i - 1])
            qnorm2 = jnp.sum(qcol[: it + 1] ** 2)
            # the reference normalizes only element 1 (iter.f:228)
            q1 = qcol[0] / jnp.sqrt(qnorm2)
            Q = Q.at[: it + 1, it].set(qcol[: it + 1]).at[0, it].set(q1)
            est = err1 * jnp.abs(q1)
            hist = jnp.where(done, hist, hist.at[gidx - 1].set(est))

            solve_now = jnp.logical_or(
                est < tol * err0, jnp.logical_or(it == m, gidx == maxit)
            )
            stop_now = jnp.logical_or(est < tol * err0, gidx == maxit)
            apply_sol = jnp.logical_and(
                ~done, jnp.logical_and(solve_now, ~cycle_solution_applied)
            )
            # solution update (iter.f:236-266): usolve U c = q(1,:)*err1,
            # combination of V columns, optional psolve, x -= z, r -= A z
            rhs_c = Q[0, :it] * err1
            c = _usolve(Uu, rhs_c, it)
            comb = jnp.sum(c[:, None] * V[:it], axis=0)
            z = psolve(comb) if psolve is not None else comb
            x = jnp.where(apply_sol, x - z, x)
            az = matvec(z)
            r = jnp.where(apply_sol, r - az, r)
            cycle_solution_applied = jnp.logical_or(
                cycle_solution_applied, apply_sol
            )
            done = jnp.logical_or(done, jnp.logical_and(apply_sol, stop_now))
    return x, hist


def _usolve(Uu, rhs, it):
    """Back substitution with the it x it upper-triangular QR factor
    (iter.f usolve)."""
    c = jnp.zeros(it, rhs.dtype)
    for i in range(it - 1, -1, -1):
        s = rhs[i] - jnp.sum(Uu[i, i + 1 : it] * c[i + 1 : it])
        c = c.at[i].set(s / Uu[i, i])
    return c

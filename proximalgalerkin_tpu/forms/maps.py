"""Entropy / Bregman nonlinearity library — the constraint-to-latent maps of
the LVPP method, jit- and AD-safe (guarded branches so jax.grad/jvp never
sees NaNs from inactive branches).

Reference counterparts:
  exp latent map            obstacle_pg.py:120 (u >= phi via exp(psi))
  softmax simplex map       multiphase_dolfinx.py:83-90
  sigmoid interval map      fracture_dolfinx.py:114 (0 <= c <= 1)
  hellinger ball map        gradient_constraint_dolfinx.py:106-107,
                            eikonal_dolfinx.py:52-58, ex40.cpp:66-93
  matrix tanh               eigenvalue_constraints_dolfinx.py:32-33,78-84
  expm2/expm3 closed forms  examples/10_monge_ampere/expm.py:43-200,
                            examples/07_.../ufl_expressions.py:16-52
  logm initial guess        monge_ampere_dolfinx.py:121-136
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ------------------------------------------------------------ scalar maps


def exp_map(psi):
    """Bound constraint u >= phi: u = phi + exp(psi)."""
    return jnp.exp(psi)


def sigmoid_interval(psi, lo=0.0, hi=1.0):
    """Two-sided bound lo <= u <= hi: u = (lo + hi*exp(psi)) / (1 + exp(psi)),
    written with jax.nn.sigmoid for overflow safety. The fracture example's
    (c_prev + exp(psi))/(exp(psi) + 1) (fracture_dolfinx.py:114) is this map
    with lo = c_prev, hi = 1."""
    s = jax.nn.sigmoid(psi)
    return lo + (hi - lo) * s


def softmax_map(psi):
    """Simplex constraint (u_m >= 0, sum u = 1): u = softmax(psi)
    (multiphase_dolfinx.py:83-90)."""
    return jax.nn.softmax(psi)


def hellinger(psi, radius=1.0):
    """Ball constraint |v| <= radius: v = radius * psi / sqrt(1 + |psi|^2).
    `psi` is a vector; safe at psi = 0."""
    n2 = jnp.sum(psi * psi)
    return radius * psi / jnp.sqrt(1.0 + n2)


def hellinger_scalar(psi, radius=1.0):
    return radius * psi / jnp.sqrt(1.0 + psi * psi)


# --------------------------------------------------- safe even functions


def _sinhc(z2):
    """sinh(sqrt(z2))/sqrt(z2) continued to z2 <= 0 (= sinc for negative),
    branch-safe: series near zero."""
    small = jnp.abs(z2) < 1e-8
    z2s = jnp.where(small, 0.0, z2)
    pos = z2s > 0
    sp = jnp.sqrt(jnp.where(pos, z2s, 1.0))
    sn = jnp.sqrt(jnp.where(pos, 1.0, -z2s))
    val = jnp.where(pos, jnp.sinh(sp) / sp, jnp.sin(sn) / sn)
    series = 1.0 + z2 / 6.0 + z2 * z2 / 120.0
    return jnp.where(small, series, val)


def _coshe(z2):
    """cosh(sqrt(z2)) continued to z2 <= 0 (= cos(sqrt(-z2)))."""
    small = jnp.abs(z2) < 1e-8
    z2s = jnp.where(small, 0.0, z2)
    pos = z2s > 0
    sp = jnp.sqrt(jnp.where(pos, z2s, 1.0))
    sn = jnp.sqrt(jnp.where(pos, 1.0, -z2s))
    val = jnp.where(pos, jnp.cosh(sp), jnp.cos(sn))
    series = 1.0 + z2 / 2.0 + z2 * z2 / 24.0
    return jnp.where(small, series, val)


# ------------------------------------------------------------ matrix maps


def expm2(A):
    """Closed-form exponential of a 2x2 matrix, covering all three
    discriminant branches (real / repeated / complex eigenvalues) with
    jnp.where-safe guards — port of the math of expm.py:43-79.

    e^A = e^tau (coshe(d2) I + sinhc(d2) (A - tau I)),
    tau = tr(A)/2, d2 = tau^2 - det A.
    """
    tau = 0.5 * (A[0, 0] + A[1, 1])
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    d2 = tau * tau - det
    N = A - tau * jnp.eye(2, dtype=A.dtype)
    return jnp.exp(tau) * (_coshe(d2) * jnp.eye(2, dtype=A.dtype)
                           + _sinhc(d2) * N)


def expm2_sym_packed(p):
    """expm of the symmetric 2x2 matrix [[p0, p1], [p1, p2]], packed in/out
    as 3-vectors (the Monge–Ampère latent packing,
    monge_ampere_dolfinx.py:51-55,74-87)."""
    A = jnp.array([[p[0], p[1]], [p[1], p[2]]])
    E = expm2(A)
    return jnp.array([E[0, 0], E[0, 1], E[1, 1]])


def tanhm_sym2_traceless(a, b):
    """tanh(M) for the traceless symmetric M = [[a, b], [b, -a]]:
    M^2 = (a^2+b^2) I so tanh(M) = tanh(lam)/lam * M — the eigenvalue
    constraint map 0.5*tanh(Psi/2) of the Landau–de Gennes example
    (eigenvalue_constraints_dolfinx.py:32-33) specializes this."""
    lam2 = a * a + b * b
    small = lam2 < 1e-16
    lam = jnp.sqrt(jnp.where(small, 1.0, lam2))
    t = jnp.where(small, 1.0 - lam2 / 3.0, jnp.tanh(lam) / lam)
    return t * a, t * b


def tanhm(M):
    """Matrix tanh for a general (small) symmetric matrix via
    tanh(M) = (e^{2M} + I)^{-1} (e^{2M} - I) — the formulation used in
    eigenvalue_constraints_dolfinx.py:78-84."""
    E = jax.scipy.linalg.expm(2.0 * M)
    I = jnp.eye(M.shape[-1], dtype=M.dtype)
    return jnp.linalg.solve(E + I, E - I)


def expm(M):
    """General matrix exponential (scaling-and-squaring), vmappable."""
    return jax.scipy.linalg.expm(M)


def expm3(A):
    """3x3 matrix exponential (expm.py:82-200 provides the closed-form
    Cayley–Hamilton branches; scaling-and-squaring is branch-free, equally
    exact, and AD-safe, so we use it as the compute path)."""
    return jax.scipy.linalg.expm(A)


def logm_spd(M):
    """Principal logarithm of a symmetric positive-definite matrix via
    eigendecomposition (the Monge–Ampère warm-start latent init,
    monge_ampere_dolfinx.py:121-136)."""
    w, V = jnp.linalg.eigh(M)
    return (V * jnp.log(jnp.maximum(w, 1e-300))) @ V.T


def logm_spd_packed(p):
    A = jnp.array([[p[0], p[1]], [p[1], p[2]]])
    L = logm_spd(A)
    return jnp.array([L[0, 0], L[0, 1], L[1, 1]])

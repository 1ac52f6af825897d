"""Continuum-mechanics and reaction-diffusion closed forms (JAX).

Re-implements reference ``glimslib/simulation_helpers/math_linear_elasticity.py``
and ``math_reaction_diffusion.py`` as array functions over per-cell (or
per-point) tensors instead of UFL symbolic expressions.  Tensor arguments are
batched over an arbitrary leading shape; the last two axes are the (d, d)
tensor axes.
"""

from __future__ import annotations

import jax.numpy as jnp


# -- material parameter maps (math_linear_elasticity.py:6-10) ---------------


def compute_mu(young_modulus, poisson_ratio):
    return young_modulus / (2.0 * (1.0 + poisson_ratio))


def compute_lambda(young_modulus, poisson_ratio):
    return (
        young_modulus
        * poisson_ratio
        / ((1.0 + poisson_ratio) * (1.0 - 2.0 * poisson_ratio))
    )


# -- kinematics / stress (math_linear_elasticity.py:12-40) ------------------


def compute_strain(grad_u):
    """Small strain sym(grad u) from the displacement gradient (..., d, d)."""
    return 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))


def compute_stress(strain, mu, lmbda):
    """Isotropic linear-elastic stress 2 mu eps + lambda tr(eps) I.

    ``mu``/``lmbda`` broadcast over the leading axes (e.g. per-cell arrays).
    """
    d = strain.shape[-1]
    tr = jnp.trace(strain, axis1=-2, axis2=-1)
    eye = jnp.eye(d, dtype=strain.dtype)
    mu = jnp.asarray(mu)[..., None, None]
    lmbda = jnp.asarray(lmbda)[..., None, None]
    return 2.0 * mu * strain + lmbda * tr[..., None, None] * eye


def compute_pressure_from_stress_tensor(stress):
    return jnp.trace(stress, axis1=-2, axis2=-1) / 3.0


def u_norm(u):
    return jnp.sqrt(jnp.sum(u * u, axis=-1))


def compute_total_jacobian(grad_u):
    d = grad_u.shape[-1]
    return jnp.linalg.det(jnp.eye(d, dtype=grad_u.dtype) + grad_u)


def compute_growth_induced_strain(conc, coupling, dim):
    """c * k * I  (math_linear_elasticity.py:32-33)."""
    eye = jnp.eye(dim)
    return jnp.asarray(conc)[..., None, None] * jnp.asarray(coupling) * eye


def compute_growth_induced_jacobian(growth_strain, dim):
    return jnp.linalg.det(jnp.eye(dim, dtype=growth_strain.dtype) + growth_strain)


def compute_deviatoric_stress_tensor(stress, dim):
    tr = jnp.trace(stress, axis1=-2, axis2=-1)
    eye = jnp.eye(dim, dtype=stress.dtype)
    return stress - (tr / 3.0)[..., None, None] * eye


def compute_van_mises_stress(stress, dim):
    dev = compute_deviatoric_stress_tensor(stress, dim)
    return jnp.sqrt(1.5 * jnp.sum(dev * dev, axis=(-2, -1)))


def compute_concentration_deformed(conc, grad_u, coupling, dim):
    """Concentration mapped to the deformed configuration
    (math_linear_elasticity.py:67-71)."""
    jac_total = compute_total_jacobian(grad_u)
    strain_growth = compute_growth_induced_strain(conc, coupling, dim)
    jac_growth = compute_growth_induced_jacobian(strain_growth, dim)
    return conc * jac_growth / jac_total


# -- reaction-diffusion (math_reaction_diffusion.py:2-3) --------------------


def compute_growth_logistic(conc, prolif_rate, conc_max):
    return prolif_rate * conc * (1.0 - conc / conc_max)

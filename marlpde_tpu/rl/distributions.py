"""Clipped-Normal policy distribution (korali's "Clipped Normal", run-vracer-burger.py:169).

A normal N(mu, sigma) whose samples are clipped to [lb, ub]; the density has
point masses Phi((lb-mu)/sigma) and 1-Phi((ub-mu)/sigma) at the bounds.
Log-probabilities, sampling, and the normal KL (used for the REFER
far-policy penalization) are all elementwise over action dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Python float (weak-typed) so float32 inputs stay float32 under x64 mode
LOG_SQRT_2PI = float(0.5 * np.log(2.0 * np.pi))


def sample(key, mu, sigma, lb, ub):
    z = mu + sigma * jax.random.normal(key, mu.shape, mu.dtype)
    return jnp.clip(z, lb, ub)


def log_prob(a, mu, sigma, lb, ub):
    """Per-dimension log density/mass of the clipped normal."""
    z = (a - mu) / sigma
    log_pdf = -0.5 * z * z - jnp.log(sigma) - LOG_SQRT_2PI
    log_cdf_lo = jax.scipy.stats.norm.logcdf((lb - mu) / sigma)
    log_sf_hi = jax.scipy.stats.norm.logsf((ub - mu) / sigma)
    out = jnp.where(a <= lb, log_cdf_lo, jnp.where(a >= ub, log_sf_hi, log_pdf))
    return out


def joint_log_prob(a, mu, sigma, lb, ub):
    """Summed over the trailing action-dim axis."""
    return log_prob(a, mu, sigma, lb, ub).sum(-1)


def kl_normal(mu_b, sigma_b, mu, sigma):
    """KL(N(mu_b, sigma_b) || N(mu, sigma)), summed over trailing axis.

    The REFER penalization pushes the current policy toward the behavior that
    generated a far-policy sample (Novati & Koumoutsakos 2019, eq. 8).
    """
    var_b = sigma_b * sigma_b
    var = sigma * sigma
    kl = jnp.log(sigma / sigma_b) + (var_b + (mu - mu_b) ** 2) / (2.0 * var) - 0.5
    return kl.sum(-1)


def kl_jeffreys(mu_b, sigma_b, mu, sigma):
    """Symmetrized (Jeffreys) KL between behavior and current policy.

    The paper's forward KL(behavior||current) is ASYMMETRIC in sigma: growing
    sigma past the behavior costs only log(sigma/sigma_b) while shrinking it
    costs sigma_b^2/(2 sigma^2) — so exploration noise can ratchet upward
    through the trust region almost for free (measured: sigma 0.26 -> 8.5
    over 100 generations on the korali-economics flagship,
    results/flagship_r3/history_905_nocap.json, degrading collection until
    training collapses).  Averaging the two directions makes the trust region
    symmetric in sigma and kills the ratchet; this is a documented deliberate
    deviation (VracerConfig.trust_region: 'jeffreys' default, 'forward' =
    paper-faithful)."""
    return 0.5 * (kl_normal(mu_b, sigma_b, mu, sigma)
                  + kl_normal(mu, sigma, mu_b, sigma_b))

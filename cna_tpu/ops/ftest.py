"""Batched F-test / min-p machinery for the global association test.

The reference scores each candidate PC count ``k`` with an F statistic and
takes the minimum p over the grid, then repeats that whole computation in
a Python loop over every permuted phenotype (``_association.py:35-61,84``
— HOT LOOP 2).  Because the PC basis ``U`` is orthonormal, the sums of
squares for *all* ``k`` at once are cumulative sums of squared PC
loadings, so the entire (Nnull x |ks|) grid collapses into two matmuls and
a cumsum — one XLA program instead of Nnull * |ks| host regressions.

Math (per phenotype column z, with zcond = M z scaled to unit std):
  beta   = U' zcond                       (all S loadings)
  ssered = zcond' zcond
  deltasse(k) = sum_{i<=k} beta_i^2       (orthonormal U => exact)
  ssefull(k)  = ssered - deltasse(k)
  F(k)   = (deltasse/k) / (ssefull/n)     ref ``_association.py:41-48``
  p(k)   = F_sf(F, k, n-(1+r+k))
  r2(k)  = deltasse/ssered

The F survival function is evaluated through the regularized incomplete
beta identity ``F_sf(f; d1, d2) = I_{d2/(d2+d1 f)}(d2/2, d1/2)``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import betainc

from . import moments


def f_sf(f, d1, d2):
    """Survival function of the F distribution, matching scipy.stats.f.sf.

    NaN for non-positive degrees of freedom (scipy convention); for f < 0
    scipy returns 1.0 (left of support).
    """
    f = jnp.asarray(f)
    valid_dof = (d1 > 0) & (d2 > 0)
    fpos = jnp.maximum(f, 0.0)
    x = d2 / (d2 + d1 * fpos)
    # guard betainc args so invalid lanes don't produce inf/nan side effects
    safe_d1 = jnp.where(valid_dof, d1, 1.0)
    safe_d2 = jnp.where(valid_dof, d2, 1.0)
    val = betainc(safe_d2 / 2.0, safe_d1 / 2.0, x)
    val = jnp.where(f < 0, 1.0, val)
    return jnp.where(valid_dof, val, jnp.nan)


def minp_stats_batch(u, m_proj, y_cols, ks, r):
    """Vectorized min-p F-test over a PC-count grid, for many phenotypes.

    Equivalent to mapping reference ``_minp_stats`` (``_association.py:
    50-61``) over the columns of ``y_cols``:
      zcond = M y;  zcond /= std(zcond)
      for k in ks: F-test of top-k PC regression; pick k minimizing p.

    ddof note: the reference's ``M.dot(z)`` is a pandas object (``M`` is a
    DataFrame), so its ``zcond.std()`` is pandas ddof=1, not numpy ddof=0.
    The F statistic is scale-invariant so either convention gives
    identical k/p/r2 (goldened); we standardize with ddof=0 here.  Any
    scale-SENSITIVE consumer of zcond (beta, yresid) must use ddof=1 —
    see ``_assoc_observed`` in ``tools/_association.py``.

    Args:
      u: (n, npc) orthonormal sample-by-PC basis (npc >= max(ks)).
      m_proj: (n, n) residualizing projector (last-M-wins from the ridge
        sweep, reference ``_nam.py:169`` / ``_association.py:51``).
      y_cols: (n, m) phenotype columns (observed and/or permuted).
      ks: int array (|ks|,) of candidate PC counts.
      r: number of covariate columns (for the F denominator dof).

    Returns (k_sel (m,), p_sel (m,), r2_sel (m,)).
    """
    n = y_cols.shape[0]
    z = m_proj @ y_cols
    z = moments.scale_by_std(z, ddof=0, axis=0)
    beta = u.T @ z  # (npc, m)
    cum = jnp.cumsum(beta * beta, axis=0)  # (npc, m)
    ssered = jnp.sum(z * z, axis=0)  # (m,)
    deltasse = cum[ks - 1, :]  # (|ks|, m)
    ssefull = ssered[None, :] - deltasse
    ksf = ks.astype(z.dtype)[:, None]
    fstat = (deltasse / ksf) / (ssefull / n)
    d2 = (n - (1.0 + r + ksf)) * jnp.ones_like(fstat)
    ps = f_sf(fstat, ksf * jnp.ones_like(fstat), d2)
    r2s = deltasse / ssered[None, :]
    # nanargmin over the ks axis (reference ``_association.py:60``)
    ps_for_min = jnp.where(jnp.isnan(ps), jnp.inf, ps)
    sel = jnp.argmin(ps_for_min, axis=0)  # (m,)
    mcols = jnp.arange(y_cols.shape[1])
    return ks[sel], ps[sel, mcols], r2s[sel, mcols]

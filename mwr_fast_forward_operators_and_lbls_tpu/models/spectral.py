"""High-resolution monochromatic forward: 50k-frequency spectra + SRF.

BASELINE config 4 — the spectral "long context" of this domain (SURVEY.md
section 5): brightness-temperature spectra on a dense monochromatic grid,
convolved with channel spectral response functions.  The reference's LBL
only ever evaluates the 14 channel centers (PyRTlib_processing.py:87-88);
this module is the native high-res capability.

Layout: frequencies ride the lane axis end-to-end — the spectral Pallas
kernel emits alpha (points, F) tiles, and the RTE runs in a (B, L, F)
layout where the level-axis prefix sum is again a lower-triangular MXU
matmul and every elementwise op vectorizes over frequency lanes.  The grid
is processed in frequency chunks to bound HBM residency, so a 50k-point
spectrum streams through in ~25 chunks of 2048.

For K-matrices of channel TBs use models/jacobians.py (the channel path is
fully differentiable); the spectral kernel itself carries no autodiff rules.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import physics as phys
from ..ops import geometry, rte, thermo
from ..ops.pallas.spectral_kernel import FLANES, ROWS, absorption_spectral


def _rte_freq_lanes(alpha, ds_km, t_k, f_ghz, t_cosmic=phys.T_COSMIC):
    """Downwelling TB with frequency on lanes.

    alpha: (B, L, F); ds_km: (B, L-1); t_k: (B, L); f_ghz: (F,).
    Returns tb (B, F), tau_total (B, F).
    """
    alpha_mid = 0.5 * (alpha[:, :-1] + alpha[:, 1:])
    dtau = alpha_mid * ds_km[:, :, None]                 # (B, L-1, F)
    lm1 = dtau.shape[1]
    tril = jnp.tril(jnp.ones((lm1, lm1), dtau.dtype))
    ctau = jnp.einsum("kl,blf->bkf", tril, dtau,
                      precision=jax.lax.Precision.HIGHEST)
    e_ctau = jnp.exp(-ctau)
    trans_below = jnp.concatenate(
        [jnp.ones_like(e_ctau[:, :1]), e_ctau[:, :-1]], axis=1)
    tau_total = ctau[:, -1]
    trans_total = e_ctau[:, -1]

    b = rte.planck_tb(t_k[:, :, None], f_ghz[None, None, :])  # (B, L, F)
    g_bot, g_top = rte._emission_factors(dtau)
    atm = jnp.sum((g_bot * b[:, :-1] + g_top * b[:, 1:]) * trans_below,
                  axis=1)                                 # (B, F)
    cosmic = rte.planck_tb(t_cosmic, f_ghz)[None] * trans_total
    tb = rte.inverse_planck_tb(atm + cosmic, f_ghz[None])
    return tb, tau_total


@functools.partial(jax.jit, static_argnames=("model", "elevations_deg",
                                             "f_range"))
def _forward_chunk(profiles, f_chunk, elevations_deg, model, f_range=None):
    p, t, rho = profiles["p"], profiles["t"], profiles["rho"]
    z = profiles["z"]
    lwc = profiles.get("lwc")
    if lwc is None:
        lwc = jnp.zeros_like(rho)
    b, l = p.shape
    n = b * l
    n_pad = -(-n // ROWS) * ROWS

    def flat(a, fill):
        v = a.reshape(-1).astype(jnp.float32)
        if n_pad != n:
            v = jnp.concatenate([v, jnp.full(n_pad - n, fill, jnp.float32)])
        return v

    alpha = absorption_spectral(
        f_chunk, flat(p, 500.0), flat(t, 250.0), flat(rho, 0.1),
        flat(lwc, 0.0), model, f_range)[:n].reshape(b, l, -1)

    e_hpa = thermo.rho_to_e(rho, t)
    tbs, taus = [], []
    for el in elevations_deg:
        ds = jax.vmap(lambda zi, pi, ti, ei: geometry.slant_path_lengths(
            zi, pi, ti, ei, el))(z, p, t, e_hpa)          # (B, L-1)
        tb, tau = _rte_freq_lanes(alpha, ds, t, f_chunk)
        tbs.append(tb)
        taus.append(tau)
    return jnp.stack(tbs, axis=1), jnp.stack(taus, axis=1)  # (B, E, Fc)


def forward_spectral(profiles: dict, f_ghz, elevations_deg=(90.0,),
                     model: str = "R24", freq_chunk: int = 2048) -> dict:
    """Monochromatic TB spectra: (B, L) profiles x (F,) grid -> (B, E, F).

    Streams the frequency grid through the spectral kernel in chunks of
    `freq_chunk` (rounded up to lane multiples); peak HBM residency is one
    (B, L, chunk) alpha block regardless of F.
    """
    import numpy as np

    # static whole-GHz bounds of the FULL grid: one promise for every
    # chunk (per-chunk bounds would be tighter but cost one kernel compile
    # per chunk), rounded so similar grids share the jit cache.  The
    # spectral kernel folds Clough masks / prunes out-of-range lines /
    # deepens the O2 divide merge against it (ops/pallas/spectral_kernel).
    # Under a trace (e.g. the shard_map spectral path) the values are not
    # concrete — fall back to the fully runtime-masked kernel.
    if isinstance(f_ghz, jax.core.Tracer):
        f_range = None
        f = f_ghz.astype(jnp.float32)
    else:
        f_np = np.asarray(f_ghz, np.float32)
        f_range = (float(np.floor(f_np.min())), float(np.ceil(f_np.max())))
        f = jnp.asarray(f_np)
    nf = f.shape[0]
    elevs = tuple(float(e) for e in elevations_deg)
    chunk = max(FLANES, (freq_chunk // FLANES) * FLANES)
    tbs, taus = [], []
    for start in range(0, nf, chunk):
        fc = f[start:start + chunk]
        npad = -(-fc.shape[0] // FLANES) * FLANES - fc.shape[0]
        if npad:
            fc = jnp.concatenate([fc, jnp.broadcast_to(fc[-1:], (npad,))])
        tb, tau = _forward_chunk(profiles, fc, elevs, model, f_range)
        good = tb.shape[-1] - npad
        tbs.append(tb[..., :good])
        taus.append(tau[..., :good])
    return {"tb": jnp.concatenate(tbs, -1), "tau_total": jnp.concatenate(taus, -1)}


def srf_convolve(tb_mono, weights):
    """Channel-SRF convolution (one MXU matmul): (..., F) x (C, F) -> (..., C)."""
    wsum = jnp.sum(weights, axis=-1, keepdims=True)
    return jnp.einsum("...f,cf->...c", tb_mono,
                      weights / jnp.maximum(wsum, 1e-30),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

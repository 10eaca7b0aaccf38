"""K-matrix Jacobians of the LBL forward operator via autodiff.

The reference extracts Jacobians d(TB)/d(p, T, ppmv, liquid) per level and
channel by parsing RTTOV-gb's K-matrix text output
(/root/reference/python_src/proc/RTTOV_gb_processing.py:287-301,364-434).
Here they fall out of `jax.jacrev` over the native forward operator — exact
to machine precision, batched, and sharded like the forward pass.

Output convention matches the reference's dataset variables
`Jacobian_{p,T,ppmv,liq}_RTTOV_gb (time, chan, elevation, level, crop)`:
each Jacobian is (F, L) per profile/angle, stacked to (B, E, F, L) batched.
"""

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops import thermo
from .lbl import LBLConfig, forward_single


def kmatrix_single(z_m, p_hpa, t_k, rho_gm3, lwc_gm3, f_ghz, elevation_deg,
                   model: str = "R24",
                   wrt: Sequence[str] = ("t", "rho", "lwc", "p")):
    """Jacobians of TB (F,) w.r.t. selected (L,) profile variables.

    Returns {name: (F, L)} for each requested variable.  `rho` is vapor
    density [g/m^3]; a ppmv-convention Jacobian is available through
    `kmatrix_ppmv_from_rho`.
    """
    args = {"p": p_hpa, "t": t_k, "rho": rho_gm3, "lwc": lwc_gm3}

    def tb_of(**kw):
        merged = {**args, **kw}
        return forward_single(
            z_m, merged["p"], merged["t"], merged["rho"], merged["lwc"],
            f_ghz, elevation_deg, model,
        )["tb"]

    out = {}
    for name in wrt:
        jac_fn = jax.jacrev(lambda v, _n=name: tb_of(**{_n: v}))
        out[name] = jac_fn(args[name])
    return out


@functools.partial(jax.jit, static_argnames=("config", "wrt"))
def kmatrix_batch(profiles: dict, config: LBLConfig = LBLConfig(),
                  wrt: tuple = ("t", "rho", "lwc")):
    """Batched K-matrix: dict of (B, L) profiles -> {name: (B, E, F, L)}."""
    dtype = jnp.dtype(config.dtype)
    f = jnp.asarray(config.freqs_ghz, dtype)
    elevs = jnp.asarray(config.elevations_deg, dtype)
    lwc = profiles.get("lwc")
    if lwc is None:
        lwc = jnp.zeros_like(profiles["rho"])

    def one(zi, pi, ti, ri, li):
        def at_elev(el):
            return kmatrix_single(zi, pi, ti, ri, li, f, el, config.model, wrt)
        return jax.vmap(at_elev)(elevs)

    return jax.vmap(one)(
        profiles["z"].astype(dtype), profiles["p"].astype(dtype),
        profiles["t"].astype(dtype), profiles["rho"].astype(dtype),
        lwc.astype(dtype),
    )


def kmatrix_ppmv_from_rho(k_rho, p_hpa, t_k):
    """Convert dTB/d(rho [g/m^3]) (..., F, L) to dTB/d(ppmv) via the chain
    rule through e = rho*Rv*T (thermo.rho_to_e) and ppmv = 1e6 * e/(p-e)."""
    e = thermo.rho_to_e(0.0 * p_hpa + 1.0, t_k)  # de/drho at fixed T [hPa per g/m^3]
    # ppmv = 1e6 * e/(p - e) -> d(ppmv)/de = 1e6 * p/(p-e)^2; at e<<p ~ 1e6/p
    dppmv_drho = 1e6 * e / p_hpa
    return k_rho / dppmv_drho[..., None, :]


def kmatrix_fast_single(params, z_m, p_hpa, t_k, rho_gm3, lwc_gm3,
                        elevation_deg, config=None,
                        wrt: Sequence[str] = ("t", "rho", "lwc")):
    """K-matrix of the FAST operator (the role RTTOV-gb's Fortran adjoint
    plays in the reference, RTTOV_gb_processing.py:287-301): autodiff through
    the feature map, regression matmul, slant geometry, and RTE.

    Returns {name: (F, L)} per profile/elevation.
    """
    from . import fast as fast_mod

    if config is None:
        config = fast_mod.FastConfig()
    args = {"p": p_hpa, "t": t_k, "rho": rho_gm3, "lwc": lwc_gm3}

    def tb_of(**kw):
        merged = {**args, **kw}
        return fast_mod.fast_forward_single(
            params, z_m, merged["p"], merged["t"], merged["rho"],
            merged["lwc"], elevation_deg, config)["tb"]

    return {name: jax.jacrev(lambda v, _n=name: tb_of(**{_n: v}))(args[name])
            for name in wrt}


def kmatrix_fast_batch(params, profiles: dict, config=None,
                       wrt: tuple = ("t", "rho", "lwc")):
    """Batched fast-operator K-matrix: {name: (B, E, F, L)}."""
    from . import fast as fast_mod

    if config is None:
        config = fast_mod.FastConfig()
    dtype = jnp.dtype(config.dtype)
    elevs = jnp.asarray(config.elevations_deg, dtype)
    lwc = profiles.get("lwc")
    if lwc is None:
        lwc = jnp.zeros_like(profiles["rho"])

    @functools.partial(jax.jit, static_argnames=("wrt",))
    def run(params, z, p, t, rho, lwc, wrt):
        def one(zi, pi, ti, ri, li):
            def at_elev(el):
                return kmatrix_fast_single(params, zi, pi, ti, ri, li, el,
                                           config, wrt)
            return jax.vmap(at_elev)(elevs)
        return jax.vmap(one)(z, p, t, rho, lwc)

    return run(params, profiles["z"].astype(dtype),
               profiles["p"].astype(dtype), profiles["t"].astype(dtype),
               profiles["rho"].astype(dtype), lwc.astype(dtype), wrt)

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


@functools.partial(jax.jit, static_argnames=("config", "wrt"))
def kmatrix_batch_fast(profiles: dict, config: LBLConfig = LBLConfig(),
                       wrt: tuple = ("t", "rho", "lwc")):
    """Batched K-matrix through the diagonal-adjoint decomposition.

    `kmatrix_batch` differentiates the whole forward operator with `jacrev`
    — F backward passes through the absorption model per (profile,
    elevation).  This path exploits two structural facts instead:

      1. absorption is local:  alpha[f, l] depends only on the atmospheric
         state at level l, so d(alpha)/d(x) is *diagonal* over levels and one
         `jax.linearize` tangent per variable (cost ~ one absorption forward
         each) yields the full elementwise partial field;
      2. the RTE is diagonal over frequency: TB[f] consumes only alpha[f, :],
         so dTB/dalpha is one cheap O(L) gradient of the geometry+RTE tail
         per (elevation, channel) scalar — no absorption physics inside.

    The chain rule then assembles

        K_x[e, f, l] = G[e, f, l] * dalpha[f, l]/dx[l]  +  D_x[e, f, l]

    where G = dTB/dalpha and D_x collects the direct (non-absorption) paths:
    Planck source (t), refraction-bent geometry (t, rho, p).  Total cost is
    ~1 + len(wrt) absorption evaluations plus a trivial RTE adjoint — vs
    ~F x len(wrt) full backward passes for `kmatrix_batch`.

    This replaces the role of RTTOV-gb's hand-written Fortran K/adjoint code
    (/root/reference/python_src/proc/RTTOV_gb_processing.py:287-301) with the
    same "adjoint written once, structurally" economics, derived here from
    autodiff primitives instead of by hand.

    Returns {name: (B, E, F, L)} like `kmatrix_batch` (bitwise-comparable up
    to fp32 reassociation).
    """
    from ..ops import geometry, rte
    from ..ops.absorption import total_absorption

    dtype = jnp.dtype(config.dtype)
    f = jnp.asarray(config.freqs_ghz, dtype)            # (F,)
    elevs = jnp.asarray(config.elevations_deg, dtype)   # (E,)
    z = profiles["z"].astype(dtype)                     # (B, L)
    p = profiles["p"].astype(dtype)
    t = profiles["t"].astype(dtype)
    rho = profiles["rho"].astype(dtype)
    lwc = profiles.get("lwc")
    lwc = jnp.zeros_like(rho) if lwc is None else lwc.astype(dtype)

    # -- 1) absorption + its elementwise partials, lanes (F, L, B) layout
    #    (batch on the minor/lane axis: full register tiles, no relayouts
    #    inside the linearized graph).
    tT, rhoT, lwcT, pT = t.T, rho.T, lwc.T, p.T          # (L, B)

    def absorb(tt, rr, ww, pp):
        return total_absorption(f[:, None, None], pp[None], tt[None],
                                rr[None], ww[None], model=config.model)

    alpha_lb, lin = jax.linearize(absorb, tT, rhoT, lwcT, pT)
    ones, zero = jnp.ones_like(tT), jnp.zeros_like(tT)
    seeds = {"t": (ones, zero, zero, zero),
             "rho": (zero, ones, zero, zero),
             "p": (zero, zero, zero, ones)}
    partials = {name: lin(*seeds[name]).transpose(2, 0, 1)   # (B, F, L)
                for name in wrt if name != "lwc"}
    if "lwc" in wrt:
        # Cloud absorption is exactly linear in LWC (Rayleigh regime), so
        # d(alpha)/d(lwc) is liquid_absorption at unit content — one direct
        # elementwise evaluation instead of a linearize tangent pass.
        from ..ops.absorption import liquid_absorption
        partials["lwc"] = jnp.broadcast_to(
            liquid_absorption(f[:, None, None], tT[None],
                              jnp.ones_like(tT)[None]),
            alpha_lb.shape).transpose(2, 0, 1)
    alpha = alpha_lb.transpose(2, 0, 1)                      # (B, F, L)

    # -- 2) geometry + RTE adjoint: grad of one scalar TB per (b, f, e).
    def tb_scalar(alpha_l, ti, pi, ri, zi, fi, el):
        e_hpa = thermo.rho_to_e(ri, ti)
        ds = geometry.slant_path_lengths(zi, pi, ti, e_hpa, el)
        return rte.downwelling_tb(alpha_l[None, :], ds, ti, fi[None])["tb"][0]

    grad_fn = jax.grad(tb_scalar, argnums=(0, 1, 2, 3))
    g_e = jax.vmap(grad_fn, in_axes=(None, None, None, None, None, None, 0))
    g_fe = jax.vmap(g_e, in_axes=(0, None, None, None, None, 0, None))
    g_bfe = jax.vmap(g_fe, in_axes=(0, 0, 0, 0, 0, None, None))
    g_alpha, d_t, d_p, d_rho = g_bfe(alpha, t, p, rho, z, f, elevs)

    def to_befl(x):                                          # (B,F,E,L) ->
        return x.transpose(0, 2, 1, 3)                       # (B,E,F,L)

    g_alpha = to_befl(g_alpha)
    direct = {"t": to_befl(d_t), "p": to_befl(d_p),
              "rho": to_befl(d_rho), "lwc": None}

    out = {}
    for name in wrt:
        k = g_alpha * partials[name][:, None]
        if direct.get(name) is not None:
            k = k + direct[name]
        out[name] = k
    return out


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

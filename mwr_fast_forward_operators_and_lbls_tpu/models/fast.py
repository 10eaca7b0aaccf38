"""Fast forward operator: predictor regression distilled from the native LBL.

The capability the reference obtains from two external Fortran executables —
RTTOV-gb (text protocol, /root/reference/python_src/proc/
RTTOV_gb_processing.py:167-305) and ARMS-gb (NetCDF protocol,
ARMS_gb_processing.py:103-212) — re-designed TPU-first.  Both are
"fast models": per-layer optical depths predicted by regression on profile
predictors, trained offline against a line-by-line model.  Here the LBL
teacher is in-process (models/lbl.py), so distillation is a single jitted
train loop on the same mesh as the forward pass, and the K-matrix falls out
of autodiff rather than a Fortran adjoint.

Design (deliberately different from RTTOV's 54-predictor fixed-layer scheme):
the regression predicts layer *extinction* [Np/km] from thermodynamic
features, and the exact refraction-bent slant geometry (ops/geometry.py)
supplies path lengths — so one coefficient set serves every elevation angle,
instead of RTTOV's secant-polynomial predictors.  The feature map is built
from the known pressure/temperature scalings of the O2 60-GHz complex
(~ p^2 * theta^n), the H2O lines (~ rho * p * theta^n), the self continuum
(~ rho^2 * theta^n) and cloud liquid (~ lwc * theta^n), which makes a
*linear* model in 18 features accurate to centikelvin while keeping inference
one (B*E*L, 18) x (18, C) MXU matmul.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..constants import hatpro
from ..ops import geometry, rte, thermo
from . import lbl as lbl_mod

N_FEATURES = 18


@dataclass(frozen=True)
class FastConfig:
    """Static config of the fast operator (hashable -> jit cache key)."""

    freqs_ghz: tuple = tuple(hatpro.HATPRO_FREQS_GHZ.tolist())
    elevations_deg: tuple = tuple(hatpro.ELEVATIONS_DEG.tolist())
    teacher_model: str = "R24"
    dtype: str = "float32"


def layer_features(p_hpa, t_k, rho_gm3, lwc_gm3):
    """Per-layer feature map (..., L-1, P) from level arrays (..., L).

    Layer means of p, T, vapor density, liquid; features are the physically
    scaled monomials listed in the module docstring.  Pure, differentiable,
    broadcastable — the K-matrix of the fast operator differentiates through
    this map.
    """
    mid = lambda a: 0.5 * (a[..., :-1] + a[..., 1:])
    p = mid(p_hpa) * 1e-3          # [bar-ish] keeps features O(1)
    th = 300.0 / mid(t_k)
    r = mid(rho_gm3) * 0.1         # O(1) for ~10 g/m^3
    w = mid(lwc_gm3)

    p2 = p * p
    rp = r * p
    feats = [
        p2, p2 * th, p2 * th**2, p2 * th**3, p2 * th**4,          # O2 band
        p2 * th**5,
        rp, rp * th, rp * th**2, rp * th**3, rp * th**4,          # H2O lines
        r * r, r * r * th, r * r * th**2,                          # self cont.
        w, w * th, w * th**2,                                      # liquid
        p * th**3,                                                 # dry cont.
    ]
    return jnp.stack(feats, axis=-1)


def init_params(config: FastConfig = FastConfig(), scale: float = 1e-3,
                seed: int = 0) -> dict:
    c = len(config.freqs_ghz)
    key = jax.random.PRNGKey(seed)
    return {"w": scale * jax.random.normal(key, (N_FEATURES, c), jnp.float32)}


def predict_extinction(params: dict, p_hpa, t_k, rho_gm3, lwc_gm3):
    """Layer extinction (..., L-1, C) [Np/km]; the single hot matmul."""
    x = layer_features(p_hpa, t_k, rho_gm3, lwc_gm3)
    alpha = jnp.einsum("...lp,pc->...lc", x, params["w"],
                       preferred_element_type=jnp.float32)
    return jnp.maximum(alpha, 0.0)


def fast_forward_single(params, z_m, p_hpa, t_k, rho_gm3, lwc_gm3,
                        elevation_deg, config: FastConfig = FastConfig()):
    """TB (C,) for one profile at one elevation via the fast operator."""
    f = jnp.asarray(config.freqs_ghz, jnp.dtype(config.dtype))
    e_hpa = thermo.rho_to_e(rho_gm3, t_k)
    ds = geometry.slant_path_lengths(z_m, p_hpa, t_k, e_hpa, elevation_deg)
    alpha = predict_extinction(params, p_hpa, t_k, rho_gm3, lwc_gm3)  # (L-1, C)
    dtau = (alpha * ds[:, None]).T  # (C, L-1)
    return rte.downwelling_tb_from_dtau(dtau, t_k, f)


@functools.partial(jax.jit, static_argnames=("config",))
def fast_forward_batch(params: dict, profiles: dict,
                       config: FastConfig = FastConfig()) -> dict:
    """Batched fast forward: dict of (B, L) profiles -> tb (B, E, C), etc."""
    dtype = jnp.dtype(config.dtype)
    elevs = jnp.asarray(config.elevations_deg, dtype)
    lwc = profiles.get("lwc")
    if lwc is None:
        lwc = jnp.zeros_like(profiles["rho"])

    def one(zi, pi, ti, ri, li):
        return jax.vmap(
            lambda el: fast_forward_single(params, zi, pi, ti, ri, li, el, config)
        )(elevs)

    return jax.vmap(one)(
        profiles["z"].astype(dtype), profiles["p"].astype(dtype),
        profiles["t"].astype(dtype), profiles["rho"].astype(dtype),
        lwc.astype(dtype),
    )


# ---------------------------------------------------------------------------
# Distillation against the in-process LBL teacher
# ---------------------------------------------------------------------------

def teacher_layer_extinction(profiles: dict, config: FastConfig) -> jax.Array:
    """LBL layer-mean extinction targets (B, L-1, C) [Np/km]."""
    from ..ops.absorption import total_absorption

    f = jnp.asarray(config.freqs_ghz, jnp.float32)
    lwc = profiles.get("lwc")
    if lwc is None:
        lwc = jnp.zeros_like(profiles["rho"])

    def one(pi, ti, ri, li):
        a = total_absorption(f[:, None], pi[None, :], ti[None, :], ri[None, :],
                             li[None, :], model=config.teacher_model)  # (C, L)
        return (0.5 * (a[:, :-1] + a[:, 1:])).T  # (L-1, C)

    return jax.vmap(one)(profiles["p"], profiles["t"], profiles["rho"], lwc)


def fit_closed_form(profiles: dict, config: FastConfig = FastConfig(),
                    ridge: float = 1e-7) -> dict:
    """One-shot ridge regression of the feature map onto LBL extinction.

    Normal equations accumulate as (P, P) / (P, C) psums — when `profiles`
    is batch-sharded over the mesh's data axis, XLA reduces the Gram matrix
    over ICI and the solve itself is replicated (P=18, trivially small).
    """
    @functools.partial(jax.jit, static_argnames=("config",))
    def _fit(profiles, config):
        lwc = profiles.get("lwc")
        if lwc is None:
            lwc = jnp.zeros_like(profiles["rho"])
        x = layer_features(profiles["p"], profiles["t"], profiles["rho"], lwc)
        y = teacher_layer_extinction(profiles, config)
        xf = x.reshape(-1, N_FEATURES).astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        yf = y.reshape(-1, y.shape[-1])
        # Row weights ~ 1/alpha emphasise the optically thin upper layers that
        # dominate V-band TB; clip keeps the weight bounded.
        wgt = 1.0 / jnp.clip(jnp.mean(yf, axis=-1, keepdims=True), 1e-4, 10.0)
        xtx = (xf * wgt).T @ xf + ridge * jnp.eye(N_FEATURES, dtype=xf.dtype)
        xty = (xf * wgt).T @ yf
        return {"w": jnp.linalg.solve(xtx, xty).astype(jnp.float32)}

    return _fit(profiles, config)


def distill_loss(params: dict, profiles: dict, targets: jax.Array,
                 config: FastConfig = FastConfig()) -> jax.Array:
    """TB-space L2 loss vs precomputed teacher TBs (B, E, C)."""
    pred = fast_forward_batch(params, profiles, config)["tb"]
    return jnp.mean((pred - targets) ** 2)


@functools.partial(jax.jit, static_argnames=("config", "optimizer"),
                   donate_argnums=(0, 1))
def train_step(params: dict, opt_state, profiles: dict, targets: jax.Array,
               config: FastConfig = FastConfig(),
               optimizer=None):
    """One distillation SGD step.  With batch-sharded `profiles`/`targets`,
    the gradient all-reduce is the only collective (pure DP over ICI)."""
    optimizer = optimizer or _default_optimizer()
    loss, grads = jax.value_and_grad(distill_loss)(params, profiles, targets, config)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


@functools.lru_cache(maxsize=None)
def _default_optimizer():
    return optax.adam(1e-4)


def distill(profiles: dict, config: FastConfig = FastConfig(),
            steps: int = 200, log_every: int = 50) -> tuple[dict, list]:
    """Closed-form init + TB-space fine-tune against the LBL teacher.

    Returns (params, loss_history).  `profiles` may be mesh-sharded; all
    compute stays on device.
    """
    params = fit_closed_form(profiles, config)
    teacher_cfg = lbl_mod.LBLConfig(
        model=config.teacher_model, freqs_ghz=config.freqs_ghz,
        elevations_deg=config.elevations_deg)
    targets = lbl_mod.forward_batch(profiles, teacher_cfg)["tb"]
    optimizer = _default_optimizer()
    opt_state = optimizer.init(params)
    history = []
    for i in range(steps):
        params, opt_state, loss = train_step(params, opt_state, profiles,
                                             targets, config, optimizer)
        if log_every and i % log_every == 0:
            history.append(float(loss))
    return params, history


def save_params(params: dict, path: str) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params(path: str) -> dict:
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}

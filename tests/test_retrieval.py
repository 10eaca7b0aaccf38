"""OEM retrieval-loop tests (BASELINE config 5: K-matrix retrieval)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mwr_fast_forward_operators_and_lbls_tpu.models import fast, lbl, retrieval


@pytest.fixture(scope="module")
def setup():
    profiles = lbl.demo_batch(16, n_levels=40)
    cfg = fast.FastConfig(elevations_deg=(90.0, 30.0, 14.4, 4.2))
    params = fast.fit_closed_form(profiles, cfg)
    ocfg = retrieval.OEMConfig(elevations_deg=cfg.elevations_deg, n_iter=4)
    return profiles, params, ocfg


def test_retrieval_recovers_perturbed_truth(setup):
    profiles, params, ocfg = setup
    i = 0
    z = profiles["z"][i]; p = profiles["p"][i]
    t_true = profiles["t"][i]; rho_true = profiles["rho"][i]
    lwc = profiles["lwc"][i]
    fcfg = fast.FastConfig(elevations_deg=ocfg.elevations_deg, outputs=("tb",))
    tb_obs = fast.fast_forward_batch(
        params, {k: v[i:i+1] for k, v in profiles.items()}, fcfg)["tb"][0]

    # prior: truth distorted by a smooth warm bias + dried-out moisture
    t_prior = t_true + 2.5
    rho_prior = rho_true * 0.7
    out = retrieval.retrieve(params, tb_obs, z, p, t_prior, rho_prior,
                             ocfg, lwc)
    err_prior_t = float(jnp.abs(t_prior - t_true).mean())
    err_post_t = float(jnp.abs(out["t"] - t_true).mean())
    assert err_post_t < 0.7 * err_prior_t, (err_prior_t, err_post_t)
    # observation fit should be close to radiometric noise
    assert float(jnp.abs(out["tb_fit"] - tb_obs).mean()) < 0.5
    # cost decreases over iterations
    cost = np.asarray(out["cost"])
    assert cost[-1] < cost[0]
    assert 0.0 < float(out["dofs"]) < 2 * z.shape[0]


def test_fast_adjoint_k_matches_jacrev(setup):
    """The closed-form fast-operator K (adjoint + diagonal locality +
    geometry sensitivities) must reproduce jacrev through the fast forward
    to fp32 reassociation — it replaces E*C backward passes per OEM
    iteration."""
    import jax

    from mwr_fast_forward_operators_and_lbls_tpu.models import jacobians

    profiles, params, ocfg = setup
    i = 1
    z = profiles["z"][i]; p = profiles["p"][i]
    t = profiles["t"][i]; rho = profiles["rho"][i]
    lwc = profiles["lwc"][i]
    fcfg = fast.FastConfig(elevations_deg=(14.4,), outputs=("tb",))

    ks = jacobians.kmatrix_fast_adjoint_single(
        params, z, p, t, rho, lwc, fcfg, wrt=("t", "rho"))

    def tb_of(tt, rr):
        out = fast.fast_forward_batch(
            params, {"z": z[None], "p": p[None], "t": tt[None],
                     "rho": rr[None], "lwc": lwc[None]}, fcfg)
        return out["tb"][0]                               # (E, C)

    k_t_ref = jax.jacrev(lambda v: tb_of(v, rho))(t)      # (E, C, L)
    k_r_ref = jax.jacrev(lambda v: tb_of(t, v))(rho)

    for got, ref in ((ks["t"], k_t_ref), (ks["rho"], k_r_ref)):
        got, ref = np.asarray(got), np.asarray(ref)
        scale = np.abs(ref).max()
        assert scale > 0
        np.testing.assert_allclose(got, ref, atol=2e-3 * scale, rtol=0,
                                   err_msg=str(np.abs(got - ref).max()))


def test_retrieval_truth_recovery_statistics(setup):
    """Retrieval-quality evidence: over an ensemble of perturbed priors the
    posterior T and rho RMS profiles must beat the prior RMS at (almost)
    every altitude — the native replacement for the reference instruments'
    neural-network L2 products (MWR_read_in_module.py:286-363)."""
    profiles, params, ocfg = setup
    n = 6
    fcfg = fast.FastConfig(elevations_deg=ocfg.elevations_deg,
                           outputs=("tb",))
    sub = {k: v[:n] for k, v in profiles.items()}
    tb = fast.fast_forward_batch(params, sub, fcfg)["tb"]
    rng = np.random.default_rng(7)
    # smooth correlated prior perturbations sized like the Sa the OEM
    # assumes (sigma_t 3 K, sigma_lnrho 0.4), centered in the lower
    # troposphere where a ground-based MWR has information content
    l = sub["t"].shape[1]
    bump = np.exp(-0.5 * ((np.arange(l)[None, :]
                           - rng.uniform(3, 25, (n, 1))) / 6.0) ** 2)
    t_prior = sub["t"] + jnp.asarray(
        4.0 * rng.standard_normal((n, 1)) * bump, jnp.float32)
    rho_prior = sub["rho"] * jnp.asarray(
        1.0 + 0.35 * rng.standard_normal((n, 1)) * bump, jnp.float32)
    out = retrieval.retrieve_batch(params, tb, sub["z"], sub["p"],
                                   t_prior, rho_prior, ocfg, sub["lwc"])

    def rms(a):
        return np.sqrt(np.mean(np.asarray(a) ** 2, axis=0))

    rms_t_prior = rms(t_prior - sub["t"])
    rms_t_post = rms(out["t"] - sub["t"])
    rms_r_prior = rms(rho_prior - sub["rho"])
    rms_r_post = rms(out["rho"] - sub["rho"])
    # vapor: the K-band is a strong total-column constraint (measured ~7x)
    assert rms_r_post.mean() < 0.3 * rms_r_prior.mean(), (
        rms_r_post.mean(), rms_r_prior.mean())
    # temperature: boundary layer (V-band weighting functions) halves;
    # the full profile improves but upper levels carry little information
    assert rms_t_post[:20].mean() < 0.6 * rms_t_prior[:20].mean(), (
        rms_t_post[:20].mean(), rms_t_prior[:20].mean())
    assert rms_t_post.mean() < 0.8 * rms_t_prior.mean(), (
        rms_t_post.mean(), rms_t_prior.mean())
    # per-altitude: no level may get materially worse than the prior
    assert (rms_t_post <= rms_t_prior + 0.1).all()
    assert (rms_r_post <= rms_r_prior + 0.05).all()
    # degrees of freedom for signal: a handful, bounded by the state size
    dofs = np.asarray(out["dofs"])
    assert (dofs > 2.0).all() and (dofs < 2 * l).all()
    # batch-shape contract (folded in here to share the retrieve_batch
    # compile): vmapped outputs carry (B, L) profiles, all finite
    assert out["t"].shape == (n, l) and out["rho"].shape == (n, l)
    assert np.isfinite(np.asarray(out["t"])).all()

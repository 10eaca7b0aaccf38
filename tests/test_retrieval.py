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


def test_retrieval_batch_shapes(setup):
    profiles, params, ocfg = setup
    n = 3
    fcfg = fast.FastConfig(elevations_deg=ocfg.elevations_deg, outputs=("tb",))
    tb = fast.fast_forward_batch(
        params, {k: v[:n] for k, v in profiles.items()}, fcfg)["tb"]
    out = retrieval.retrieve_batch(
        params, tb, profiles["z"][:n], profiles["p"][:n],
        profiles["t"][:n] + 1.0, profiles["rho"][:n],
        ocfg, profiles["lwc"][:n])
    assert out["t"].shape == (n, 40)
    assert out["rho"].shape == (n, 40)
    assert np.isfinite(np.asarray(out["t"])).all()

"""Unit tests for diffusion schedules vs closed form (SURVEY.md §4 Unit)."""

import numpy as np
import pytest

from t2v.diffusion.schedules import (
    DiffusionSchedule,
    beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
    modelscope_timesteps,
)


def test_linear_sd_betas_closed_form():
    betas = beta_schedule("linear_sd", 1000)
    # endpoints are exactly the configured values (t2v_pipeline.py:107-111)
    assert betas.dtype == np.float64
    assert betas[0] == pytest.approx(0.00085, rel=1e-12)
    assert betas[-1] == pytest.approx(0.0120, rel=1e-12)
    # sqrt-space linearity
    d = np.diff(np.sqrt(betas))
    assert np.allclose(d, d[0])


def test_linear_sd_monotone_valid():
    betas = beta_schedule("linear_sd", 1000)
    assert (betas > 0).all() and (betas <= 1).all()
    assert (np.diff(betas) > 0).all()


def test_schedule_tables_identities():
    s = DiffusionSchedule.linear_sd(1000)
    ac = np.cumprod(1 - s.betas)
    assert np.allclose(s.alphas_cumprod, ac.astype(np.float32))
    assert np.allclose(s.sqrt_alphas_cumprod**2 + s.sqrt_one_minus_alphas_cumprod**2,
                       1.0, atol=1e-6)
    assert s.alphas_cumprod_prev[0] == 1.0
    assert np.allclose(s.alphas_cumprod_prev[1:], s.alphas_cumprod[:-1])
    # posterior variance identity: beta_t * (1-acp_prev)/(1-acp)
    pv = s.betas * (1 - np.concatenate([[1.0], ac[:-1]])) / (1 - ac)
    assert np.allclose(s.posterior_variance, pv.astype(np.float32), rtol=1e-5)


def test_modelscope_timesteps_ladder():
    # stride=33 ladder (gaussian_sampler.py:75-88): first rung 991, last 34
    ts = modelscope_timesteps(1000, 30)
    assert len(ts) == 30
    assert ts[0] == 991
    assert ts[-1] == 34
    assert (np.diff(ts) < 0).all()


def test_modelscope_timesteps_clamp():
    # steps=1000 -> stride 1, top rung clamps to T-1
    ts = modelscope_timesteps(1000, 1000)
    assert ts[0] == 999
    assert ts[-1] == 1


def test_ddim_timesteps_uniform():
    ts = make_ddim_timesteps(20, 1000)
    assert ts[0] == 1 and ts[-1] == 951 and len(ts) == 20
    assert (np.diff(ts) == 50).all()


def test_ddim_sampling_parameters():
    s = DiffusionSchedule.linear_sd(1000)
    ts = make_ddim_timesteps(20, 1000)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        s.alphas_cumprod, ts, eta=0.0
    )
    assert (sigmas == 0).all()
    assert alphas_prev[0] == s.alphas_cumprod[0]
    assert np.allclose(alphas_prev[1:], alphas[:-1])
    sig, _, _ = make_ddim_sampling_parameters(s.alphas_cumprod, ts, eta=1.0)
    expect = np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    assert np.allclose(sig, expect, rtol=1e-5)


def test_cosine_schedule_valid():
    betas = beta_schedule("cosine", 1000)
    assert (betas > 0).all() and (betas <= 0.999).all()

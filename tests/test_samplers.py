"""Sampler step math vs independent numpy re-derivations (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2v.core import rng as rng_lib
from t2v.diffusion import ddim as ddim_mod
from t2v.diffusion import ddim_gaussian as gaussian_mod
from t2v.diffusion import unipc as unipc_mod
from t2v.diffusion.sampling import cfg_combine, make_eps_fn, sample_loop
from t2v.diffusion.schedules import DiffusionSchedule

SCHED = DiffusionSchedule.linear_sd(1000)
SHAPE = (1, 2, 4, 4, 4)  # (B, F, H, W, C) latent


def zero_model(x, t, ctx):
    return jnp.zeros_like(x)


def identity_eps_model(x, t, ctx):
    return x * 0.1


class TestGaussianStep:
    def test_zero_eps_contracts_to_scaled_x(self):
        p = gaussian_mod.plan(SCHED, 20)
        x = jnp.ones(SHAPE)
        i = 3
        out = gaussian_mod.step(x, jnp.zeros_like(x), p, i, jnp.zeros_like(x))
        # eps=0: x0 = sr*x, x_prev = sqrt(a_prev)*x0
        expect = np.sqrt(p.alphas_prev[i]) * p.sqrt_recip_alphas_cumprod[i]
        assert np.allclose(out, expect, rtol=1e-5)

    def test_numpy_parity_random_eps(self, rng):
        p = gaussian_mod.plan(SCHED, 20, eta=0.5)
        x = rng.normal(size=SHAPE).astype(np.float32)
        eps = rng.normal(size=SHAPE).astype(np.float32)
        noise = rng.normal(size=SHAPE).astype(np.float32)
        i = 5
        out = gaussian_mod.step(jnp.asarray(x), jnp.asarray(eps), p, i, jnp.asarray(noise))
        # independent re-derivation of gaussian_sampler.py:252-283
        x0 = p.sqrt_recip_alphas_cumprod[i] * x - p.sqrt_recipm1_alphas_cumprod[i] * eps
        sigma = p.sigmas[i]
        direction = np.sqrt(1 - p.alphas_prev[i] - sigma**2) * eps
        expect = np.sqrt(p.alphas_prev[i]) * x0 + direction + sigma * noise
        assert np.allclose(out, expect, rtol=1e-4, atol=1e-5)

    def test_final_step_no_eta_noise_when_t0(self):
        # nonzero gate: only t==0 suppresses noise; ladder's last rung is 34
        p = gaussian_mod.plan(SCHED, 20, eta=1.0)
        assert p.timesteps[-1] != 0  # ladder quirk preserved


class TestDDIMStep:
    def test_plan_orientation(self):
        p = ddim_mod.plan(SCHED, 20)
        assert p.timesteps[0] == 951 and p.timesteps[-1] == 1
        assert (np.diff(p.alphas) > 0).all()  # descending t -> ascending alpha

    def test_numpy_parity(self, rng):
        p = ddim_mod.plan(SCHED, 20, eta=0.3)
        x = rng.normal(size=SHAPE).astype(np.float32)
        eps = rng.normal(size=SHAPE).astype(np.float32)
        noise = rng.normal(size=SHAPE).astype(np.float32)
        i = 7
        out = ddim_mod.step(jnp.asarray(x), jnp.asarray(eps), p, i, jnp.asarray(noise))
        pred_x0 = (x - p.sqrt_one_minus_alphas[i] * eps) / np.sqrt(p.alphas[i])
        dir_xt = np.sqrt(1 - p.alphas_prev[i] - p.sigmas[i] ** 2) * eps
        expect = np.sqrt(p.alphas_prev[i]) * pred_x0 + dir_xt + p.sigmas[i] * noise
        assert np.allclose(out, expect, rtol=1e-4, atol=1e-5)

    def test_vid2vid_truncation(self):
        p = ddim_mod.plan(SCHED, 20)
        pt = ddim_mod.truncate_for_vid2vid(p, 15)
        assert pt.steps == 15
        # decode runs the *first* 15 ascending rungs, descending
        assert pt.timesteps[0] == p.timesteps[5]
        assert pt.timesteps[-1] == 1

    def test_stochastic_encode(self, rng):
        p = ddim_mod.plan(SCHED, 20)
        x0 = rng.normal(size=SHAPE).astype(np.float32)
        noise = rng.normal(size=SHAPE).astype(np.float32)
        out = ddim_mod.stochastic_encode(p, x0, noise, 15)
        a = p.ddim_alphas_asc[15]
        expect = np.sqrt(a) * x0 + np.sqrt(1 - a) * noise
        assert np.allclose(out, expect, rtol=1e-5)


class TestCFG:
    def test_full(self):
        y, u = jnp.ones((1, 4)), jnp.zeros((1, 4))
        assert np.allclose(cfg_combine(y, u, 7.0, "full"), 7.0)

    def test_split_learned_range(self):
        y = jnp.ones((1, 2, 4))
        u = jnp.zeros((1, 2, 4))
        out = np.asarray(cfg_combine(y, u, 9.0, "split_learned_range"))
        assert np.allclose(out[..., :2], 9.0)  # guided channels
        assert np.allclose(out[..., 2:], 1.0)  # copied from cond

    def test_fused_batching_matches_two_pass(self, rng):
        cond = jnp.asarray(rng.normal(size=(1, 7, 8)).astype(np.float32))
        uncond = jnp.asarray(rng.normal(size=(1, 7, 8)).astype(np.float32))

        def model(x, t, ctx):
            # context-sensitive fake model, per-sample reduction
            bias = ctx.mean(axis=(1, 2)).reshape((-1,) + (1,) * (x.ndim - 1))
            return x + bias

        eps_fn = make_eps_fn(model, cond, uncond, 5.0, "full")
        x = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
        fused = eps_fn(x, 10.0, 0)
        y = model(x, None, cond)
        u = model(x, None, uncond)
        # reduction order differs between fused and two-pass in the fake
        # model's mean -> fp32 noise amplified by the guidance scale
        assert np.allclose(fused, u + 5.0 * (y - u), atol=2e-3)


class TestUniPCPlan:
    def test_rungs(self):
        p = unipc_mod.plan(SCHED, 20)
        assert p.steps == 20
        assert p.t_cont[0] == pytest.approx(1.0)
        assert p.t_cont[-1] == pytest.approx(1e-3)
        # model input times: t=1.0 -> 999.0 (get_model_input_time)
        assert p.t_input[0] == pytest.approx(999.0)
        assert p.t_input[-1] == pytest.approx(0.0, abs=1e-9)

    def test_marginals_match_table_at_gridpoints(self):
        # t exactly (i+1)/N must hit the discrete table entries
        p = unipc_mod.plan(SCHED, 999)
        ac = SCHED.alphas_cumprod_f64
        i = 500
        t = p.t_cont[np.argmin(np.abs(p.t_cont - (i + 1) / 1000))]
        idx = int(round(t * 1000)) - 1
        _, alpha, _, _ = unipc_mod._discrete_marginals(SCHED, np.array([t]))
        assert alpha[0] == pytest.approx(np.sqrt(ac[idx]), rel=1e-6)

    def test_coeff_order3_r_solve(self):
        p = unipc_mod.plan(SCHED, 20)
        rks, c_x, c_m, aB, rhos_p, rhos_c = unipc_mod._step_coeffs(p, 5, 3)
        assert rks.shape == (3,) and rks[-1] == 1.0
        assert rhos_p.shape == (2,) and rhos_c.shape == (3,)
        # R @ rhos_c == b by construction
        h = p.lam[5] - p.lam[4]
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = hh
        b1 = (h_phi_1 / hh - 1.0) / B_h
        R1 = np.stack([rks**0, rks**1, rks**2])
        assert np.allclose(R1 @ rhos_c, [b1, *(R1 @ rhos_c)[1:]])


class TestDPMpp2M:
    """DPM-Solver++(2M) (t2v/diffusion/dpmpp.py) vs an independent NumPy
    re-derivation of the multistep update (arXiv:2211.01095 eq. 4.3)."""

    def test_numpy_parity(self):
        from t2v.diffusion import dpmpp as dpmpp_mod
        from t2v.diffusion.sampling import _unipc_model_fn

        steps = 9
        p = dpmpp_mod.plan(SCHED, steps)
        cond = jnp.zeros((1, 7, 8))
        key = rng_lib.key_for_seed(11)
        x0 = rng_lib.latent_noise(key, SHAPE, jnp.float32)
        model_fn = _unipc_model_fn(identity_eps_model, cond, None, 1.0, p)
        got = np.asarray(dpmpp_mod.sample(x0, model_fn, p))

        # independent loop: recompute marginals from the plan's rung times
        # and apply the textbook recursion with plain float64 numpy
        alpha = np.asarray(p.alpha)
        sigma = np.asarray(p.sigma)
        lam = np.log(alpha) - np.log(sigma)
        x = np.asarray(x0, np.float64)
        d_prev = None
        for i in range(steps):
            eps = 0.1 * x  # identity_eps_model
            d = (x - sigma[i] * eps) / alpha[i]
            h = lam[i + 1] - lam[i]
            if d_prev is None:
                d_bar = d
            else:
                r = (lam[i] - lam[i - 1]) / h
                d_bar = (1 + 1 / (2 * r)) * d - (1 / (2 * r)) * d_prev
            x = (sigma[i + 1] / sigma[i]) * x + alpha[i + 1] * (
                1 - np.exp(-h)
            ) * d_bar
            d_prev = d
        np.testing.assert_allclose(got, x, rtol=2e-4, atol=2e-5)

    def test_second_order_beats_ddim_at_equal_steps(self):
        """Against a near-exact reference (DDIM at 400 steps), DPM++ 2M at
        12 steps must land closer than DDIM at 12 steps — the practical
        claim of the sampler."""
        key = rng_lib.key_for_seed(4)
        cond = jnp.zeros((1, 7, 8))
        noise = rng_lib.latent_noise(key, SHAPE, jnp.float32)
        kw = dict(shape=SHAPE, cond=cond, key=key, noise=noise)
        truth = np.asarray(sample_loop(
            identity_eps_model, SCHED, steps=400, sampler_name="DDIM", **kw
        ))
        ddim12 = np.asarray(sample_loop(
            identity_eps_model, SCHED, steps=12, sampler_name="DDIM", **kw
        ))
        dpm12 = np.asarray(sample_loop(
            identity_eps_model, SCHED, steps=12, sampler_name="DPM++ 2M", **kw
        ))
        err_ddim = np.abs(ddim12 - truth).mean()
        err_dpm = np.abs(dpm12 - truth).mean()
        assert err_dpm < err_ddim, (err_dpm, err_ddim)

    def test_first_step_is_first_order(self):
        from t2v.diffusion import dpmpp as dpmpp_mod

        p = dpmpp_mod.plan(SCHED, 6)
        assert p.c_cur[0] == 1.0 and p.c_prev[0] == 0.0
        # weights always sum to 1 (consistency of the multistep combo)
        np.testing.assert_allclose(p.c_cur + p.c_prev, 1.0, rtol=1e-12)

    def test_karras_rungs(self):
        """Karras spacing: same endpoints as uniform, monotone noise decay,
        rho-7 ramp exact on the noise-to-signal ratios."""
        from t2v.diffusion import dpmpp as dpmpp_mod

        steps = 10
        pu = dpmpp_mod.plan(SCHED, steps)
        pk = dpmpp_mod.plan(SCHED, steps, node_schedule="karras")
        nsr_u = np.asarray(pu.sigma) / np.asarray(pu.alpha)
        nsr_k = np.asarray(pk.sigma) / np.asarray(pk.alpha)
        np.testing.assert_allclose(nsr_k[0], nsr_u[0], rtol=1e-3)
        np.testing.assert_allclose(nsr_k[-1], nsr_u[-1], rtol=1e-3)
        assert (np.diff(nsr_k) < 0).all()  # strictly decaying noise
        rho = 7.0
        u = np.linspace(0, 1, steps + 1)
        want = (
            nsr_k[0] ** (1 / rho) + u * (nsr_k[-1] ** (1 / rho) - nsr_k[0] ** (1 / rho))
        ) ** rho
        np.testing.assert_allclose(nsr_k, want, rtol=2e-3)

    def test_karras_numpy_parity(self):
        """The 2M recursion over the Karras plan must match the same
        independent NumPy loop (tables differ, solver identical)."""
        from t2v.diffusion import dpmpp as dpmpp_mod
        from t2v.diffusion.sampling import _unipc_model_fn

        steps = 7
        p = dpmpp_mod.karras.plan(SCHED, steps)
        cond = jnp.zeros((1, 7, 8))
        x0 = rng_lib.latent_noise(rng_lib.key_for_seed(2), SHAPE, jnp.float32)
        model_fn = _unipc_model_fn(identity_eps_model, cond, None, 1.0, p)
        got = np.asarray(dpmpp_mod.sample(x0, model_fn, p))
        alpha, sigma = np.asarray(p.alpha), np.asarray(p.sigma)
        lam = np.log(alpha) - np.log(sigma)
        x = np.asarray(x0, np.float64)
        d_prev = None
        for i in range(steps):
            d = (x - sigma[i] * (0.1 * x)) / alpha[i]
            h = lam[i + 1] - lam[i]
            if d_prev is None:
                d_bar = d
            else:
                r = (lam[i] - lam[i - 1]) / h
                d_bar = (1 + 1 / (2 * r)) * d - (1 / (2 * r)) * d_prev
            x = (sigma[i + 1] / sigma[i]) * x + alpha[i + 1] * (1 - np.exp(-h)) * d_bar
            d_prev = d
        np.testing.assert_allclose(got, x, rtol=2e-4, atol=2e-5)


class TestEuler:
    """Euler / Euler-a (t2v/diffusion/euler.py) vs an independent NumPy
    loop in the k-diffusion space (arXiv:2206.00364 Alg. 1-2)."""

    def test_numpy_parity_euler(self):
        from t2v.diffusion import euler as euler_mod

        steps = 8
        key = rng_lib.key_for_seed(3)
        cond = jnp.zeros((1, 7, 8))
        noise = rng_lib.latent_noise(key, SHAPE, jnp.float32)
        got = np.asarray(sample_loop(
            identity_eps_model, SCHED, steps=steps, shape=SHAPE, cond=cond,
            sampler_name="Euler", key=key, noise=noise,
        ))

        # independent loop: rebuild the (abar, sig) ladder from the plan's
        # visited timesteps and run the textbook k-space Euler recursion
        p = euler_mod.plan(SCHED, steps)
        abar = np.concatenate([SCHED.alphas_cumprod[p.timesteps], [1.0]])
        sig = np.sqrt(1.0 - abar) / np.sqrt(abar)
        x_vp = np.asarray(noise, np.float64)
        for i in range(p.steps):
            eps = 0.1 * x_vp  # identity_eps_model sees the VP-space state
            x_k = x_vp / np.sqrt(abar[i])
            x_k = x_k + eps * (sig[i + 1] - sig[i])
            x_vp = np.sqrt(abar[i + 1]) * x_k
        np.testing.assert_allclose(got, x_vp, rtol=2e-5, atol=2e-6)

    def test_single_step_lands_on_x0_prediction(self):
        from t2v.diffusion import euler as euler_mod

        p = euler_mod.plan(SCHED, 1)
        key = rng_lib.key_for_seed(9)
        x = rng_lib.latent_noise(key, SHAPE, jnp.float32)
        eps = 0.5 * x
        out = np.asarray(euler_mod.step(x, eps, p, 0, jnp.zeros((), x.dtype)))
        t = int(p.timesteps[0])
        x0 = (np.asarray(x) - SCHED.sqrt_one_minus_alphas_cumprod[t] * np.asarray(eps)) / (
            SCHED.sqrt_alphas_cumprod[t]
        )
        np.testing.assert_allclose(out, x0, rtol=1e-5, atol=1e-6)

    def test_ancestral_tables(self):
        from t2v.diffusion import euler as euler_mod

        p = euler_mod.plan(SCHED, 10)
        pa = euler_mod.ancestral.plan(SCHED, 10)
        # plain Euler is deterministic; ancestral injects noise on every
        # step except the terminal one (sig_next = 0 there)
        assert not p.c_noise.any()
        assert (pa.c_noise[:-1] > 0).all() and pa.c_noise[-1] == 0.0
        # ancestral splits sig_next into (sig_dn, sig_up) with
        # sig_dn^2 + sig_up^2 = sig_next^2 — check via the stored coeffs
        abar = np.concatenate([SCHED.alphas_cumprod[pa.timesteps], [1.0]])
        sig = np.sqrt(1.0 - abar) / np.sqrt(abar)
        sig_dn = pa.c_eps / np.sqrt(abar[1:]) + sig[:-1]
        sig_up = pa.c_noise / np.sqrt(abar[1:])
        # tables are stored float32 — identity holds to fp32 rounding
        np.testing.assert_allclose(
            sig_dn**2 + sig_up**2, sig[1:] ** 2, rtol=1e-6, atol=1e-9
        )

    def test_ancestral_differs_and_deterministic(self):
        key = rng_lib.key_for_seed(7)
        cond = jnp.zeros((1, 7, 8))
        kw = dict(steps=6, shape=SHAPE, cond=cond, key=key)
        e = sample_loop(identity_eps_model, SCHED, sampler_name="Euler", **kw)
        a1 = sample_loop(identity_eps_model, SCHED, sampler_name="Euler a", **kw)
        a2 = sample_loop(identity_eps_model, SCHED, sampler_name="Euler a", **kw)
        assert not np.allclose(e, a1)
        assert np.allclose(a1, a2)

    def test_euler_tracks_ddim_dense_limit(self):
        """Both discretize the same probability-flow ODE: at many steps
        Euler and DDIM must converge to each other."""
        key = rng_lib.key_for_seed(4)
        cond = jnp.zeros((1, 7, 8))
        noise = rng_lib.latent_noise(key, SHAPE, jnp.float32)
        kw = dict(shape=SHAPE, cond=cond, key=key, noise=noise)
        e = np.asarray(sample_loop(
            identity_eps_model, SCHED, steps=200, sampler_name="Euler", **kw
        ))
        d = np.asarray(sample_loop(
            identity_eps_model, SCHED, steps=200, sampler_name="DDIM", **kw
        ))
        assert np.abs(e - d).mean() < 5e-3 * np.abs(d).mean()

    def test_deepcache_supports_euler(self):
        from t2v.diffusion.deepcache import deepcache_plan

        mod, p = deepcache_plan("Euler a", SCHED, 8, 0.0)
        assert getattr(mod, "NEEDS_STEP_NOISE", False)
        assert p.steps == 8


class TestSampleLoopEndToEnd:
    @pytest.mark.parametrize("name", ["DDIM_Gaussian", "DDIM", "UniPC", "DPM++ 2M", "DPM++ 2M Karras", "Euler", "Euler a"])
    def test_runs_and_deterministic(self, name):
        key = rng_lib.key_for_seed(7)
        cond = jnp.zeros((1, 7, 8))
        uncond = jnp.zeros((1, 7, 8))
        kw = dict(
            steps=6, shape=SHAPE, cond=cond, uncond=uncond,
            guidance_scale=9.0, sampler_name=name, key=key,
        )
        x1 = sample_loop(identity_eps_model, SCHED, **kw)
        x2 = sample_loop(identity_eps_model, SCHED, **kw)
        assert x1.shape == SHAPE
        assert np.isfinite(np.asarray(x1)).all()
        assert np.allclose(x1, x2)

    def test_eta_noise_changes_result(self):
        key = rng_lib.key_for_seed(7)
        cond = jnp.zeros((1, 7, 8))
        base = sample_loop(
            identity_eps_model, SCHED, steps=6, shape=SHAPE, cond=cond,
            sampler_name="DDIM_Gaussian", key=key,
        )
        noisy = sample_loop(
            identity_eps_model, SCHED, steps=6, shape=SHAPE, cond=cond,
            sampler_name="DDIM_Gaussian", key=key, eta=1.0,
        )
        assert not np.allclose(base, noisy)

    def test_unipc_scan_matches_unrolled(self):
        # the scanned homogeneous middle must equal the fully-unrolled loop
        key = rng_lib.key_for_seed(3)
        cond = jnp.zeros((1, 7, 8))
        kw = dict(steps=12, shape=SHAPE, cond=cond, sampler_name="UniPC", key=key)
        x_scan = sample_loop(identity_eps_model, SCHED, **kw)

        p = unipc_mod.plan(SCHED, 12)
        from t2v.diffusion.sampling import _unipc_model_fn
        model_fn = _unipc_model_fn(identity_eps_model, cond, None, 1.0, p)
        x0 = rng_lib.latent_noise(key, SHAPE, jnp.float32)
        x_unrolled = unipc_mod.sample(x0, model_fn, p, unroll_threshold=10**9)
        assert np.allclose(x_scan, x_unrolled, rtol=1e-4, atol=1e-5)

    def test_vid2vid_paths(self):
        key = rng_lib.key_for_seed(5)
        cond = jnp.zeros((1, 7, 8))
        latents = jnp.ones(SHAPE) * 0.3
        for name in ["DDIM_Gaussian", "DDIM", "UniPC", "DPM++ 2M", "DPM++ 2M Karras", "Euler", "Euler a"]:
            out = sample_loop(
                identity_eps_model, SCHED, steps=8, shape=SHAPE, cond=cond,
                sampler_name=name, key=key, latents=latents,
                is_vid2vid=True, strength=0.6,
            )
            assert out.shape == SHAPE
            assert np.isfinite(np.asarray(out)).all()

    def test_chunked_callback(self):
        key = rng_lib.key_for_seed(7)
        cond = jnp.zeros((1, 7, 8))
        seen = []
        kw = dict(steps=6, shape=SHAPE, cond=cond, sampler_name="DDIM_Gaussian", key=key)
        x_full = sample_loop(identity_eps_model, SCHED, **kw)
        x_chunk = sample_loop(
            identity_eps_model, SCHED, **kw,
            callback=seen.append, callback_interval=2,
        )
        assert seen == [2, 4, 6]
        assert np.allclose(x_full, x_chunk, rtol=1e-5, atol=1e-6)


class TestUniPCWindowed:
    def test_windowed_segments_match_monolithic(self):
        import jax
        import jax.numpy as jnp

        from t2v.core import rng as rng_lib
        from t2v.diffusion import unipc
        from t2v.diffusion.schedules import DiffusionSchedule

        sched = DiffusionSchedule.linear_sd(1000)
        p = unipc.plan(sched, 10)

        def model_fn(x, t_input, s):
            return 0.3 * x + 0.01 * t_input

        x0 = rng_lib.latent_noise(rng_lib.key_for_seed(4), (1, 2, 8, 8, 4))
        ref = unipc.sample(x0, model_fn, p)

        x, models = unipc.warmup(x0, model_fn, p)
        L = len(unipc.homo_range(p))
        off = 0
        for n in (4, L - 4):
            x, models = unipc.homo_window(
                x, models, model_fn, p, jnp.asarray(off), n
            )
            off += n
        out = unipc.tail(x, models, model_fn, p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_pipeline_unipc_windowed_matches_monolithic(self):
        from t2v.core.config import T2VArgs
        from t2v.core.state import JobState
        from t2v.pipeline.pipeline import ModelScopePipeline

        pipe = ModelScopePipeline.random_init()
        args = T2VArgs(
            prompt="x", n_prompt="n", steps=8, frames=2, width=32, height=32,
            seed=3, sampler="UniPC",
        )
        ref = pipe.infer(args)  # monolithic (callback None)
        st = JobState()
        st.begin_job(0, 1, 8)
        out = pipe.infer(args, callback=st.step_callback, callback_interval=2)
        assert st.sampling_step == 8
        np.testing.assert_allclose(
            np.asarray(out.latents), np.asarray(ref.latents), atol=1e-4
        )


class TestDPMppWindowed:
    """Windowed (interrupt-capable) DPM++ 2M execution — the multistep
    carry (x, prev_D) crosses jitted windows (VERDICT r2 weak #3)."""

    @pytest.mark.parametrize("variant", ["uniform", "karras"])
    def test_windows_match_monolithic(self, variant):
        from t2v.diffusion import dpmpp

        mod = dpmpp.karras if variant == "karras" else dpmpp
        p = mod.plan(SCHED, 10)

        def model_fn(x, t_input, s):
            return 0.3 * x + 0.01 * t_input

        x0 = rng_lib.latent_noise(rng_lib.key_for_seed(4), (1, 2, 8, 8, 4))
        ref = dpmpp.sample(x0, model_fn, p)

        x, d_prev = x0, jnp.zeros_like(x0)
        off = 0
        for n in (3, 4, 3):
            x, d_prev = dpmpp.window(x, d_prev, model_fn, p, off, n)
            off += n
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref), atol=1e-5)

    def test_pipeline_dpmpp_windowed_matches_monolithic(self):
        from t2v.core.config import T2VArgs
        from t2v.core.state import JobState
        from t2v.pipeline.pipeline import ModelScopePipeline

        pipe = ModelScopePipeline.random_init()
        args = T2VArgs(
            prompt="x", n_prompt="n", steps=8, frames=2, width=32, height=32,
            seed=3, sampler="DPM++ 2M",
        )
        ref = pipe.infer(args)  # monolithic (callback None)
        st = JobState()
        st.begin_job(0, 1, 8)
        out = pipe.infer(args, callback=st.step_callback, callback_interval=2)
        assert st.sampling_step == 8
        np.testing.assert_allclose(
            np.asarray(out.latents), np.asarray(ref.latents), atol=1e-4
        )

    def test_pipeline_dpmpp_interrupt_mid_run(self):
        from t2v.core.config import T2VArgs
        from t2v.core.state import InterruptedException, JobState
        from t2v.pipeline.pipeline import ModelScopePipeline

        pipe = ModelScopePipeline.random_init()
        args = T2VArgs(
            prompt="x", n_prompt="n", steps=8, frames=2, width=32, height=32,
            seed=3, sampler="DPM++ 2M",
        )
        st = JobState()
        st.begin_job(0, 1, 8)
        calls = []

        def cb(step):
            calls.append(step)
            if step >= 4:
                st.interrupt()
            st.step_callback(step)

        with pytest.raises(InterruptedException):
            pipe.infer(args, callback=cb, callback_interval=2)
        # interrupted after the second window — not the full 8 steps
        assert calls == [2, 4]


class TestParameterization:
    """Non-eps model prediction targets (reference DDIM hooks
    sampler.py:183-206, UniPC model_wrapper uni_pc.py:156-311)."""

    def test_out_to_eps_algebra(self, rng):
        from t2v.diffusion.sampling import make_out_to_eps

        t = 417
        a = float(SCHED.sqrt_alphas_cumprod[t])
        b = float(SCHED.sqrt_one_minus_alphas_cumprod[t])
        x0 = rng.normal(size=SHAPE).astype(np.float32)
        eps = rng.normal(size=SHAPE).astype(np.float32)
        xt = a * x0 + b * eps
        v = a * eps - b * x0
        conv_v = make_out_to_eps("v", SCHED)
        conv_x0 = make_out_to_eps("x0", SCHED)
        np.testing.assert_allclose(
            np.asarray(conv_v(jnp.asarray(v), jnp.asarray(xt), jnp.float32(t))),
            eps, rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(conv_x0(jnp.asarray(x0), jnp.asarray(xt), jnp.float32(t))),
            eps, rtol=1e-4, atol=1e-4,
        )
        # eps mode is a passthrough
        assert make_out_to_eps("eps", None)(eps, xt, t) is eps

    def test_out_to_eps_learned_variance_passthrough(self, rng):
        from t2v.diffusion.sampling import make_out_to_eps

        x = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))
        out = jnp.asarray(rng.normal(size=SHAPE[:-1] + (8,)).astype(np.float32))
        got = make_out_to_eps("v", SCHED)(out, x, jnp.float32(100))
        assert got.shape == out.shape
        np.testing.assert_allclose(np.asarray(got[..., 4:]), np.asarray(out[..., 4:]))

    def _v_model(self):
        sa = jnp.asarray(SCHED.sqrt_alphas_cumprod)
        s1ma = jnp.asarray(SCHED.sqrt_one_minus_alphas_cumprod)

        def v_model(x, t, ctx):
            # same prediction as identity_eps_model, expressed as v:
            # v = (eps - sqrt(1-a)*x) / sqrt(a)
            ti = jnp.asarray(t, jnp.int32).reshape((-1,) + (1,) * (x.ndim - 1))
            return (0.1 * x - s1ma[ti] * x) / sa[ti]

        return v_model

    @pytest.mark.parametrize("name", ["DDIM_Gaussian", "DDIM"])
    def test_scan_samplers_v_matches_eps(self, name):
        cond = jnp.zeros((1, 7, 8))
        key = rng_lib.key_for_seed(11)
        ref = sample_loop(
            identity_eps_model, SCHED, steps=8, shape=SHAPE, cond=cond,
            sampler_name=name, key=key,
        )
        out = sample_loop(
            self._v_model(), SCHED, steps=8, shape=SHAPE, cond=cond,
            sampler_name=name, key=key, parameterization="v",
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def test_unipc_v_matches_eps(self):
        # UniPC converts via the plan's continuous-time marginals; build the
        # v model from the same continuous tables (interp over t_input).
        p = unipc_mod.plan(SCHED, 8)
        t_in = jnp.asarray(p.t_input[::-1].copy(), jnp.float32)
        al = jnp.asarray(p.alpha[::-1].copy(), jnp.float32)
        si = jnp.asarray(p.sigma[::-1].copy(), jnp.float32)

        def v_model(x, t, ctx):
            a = jnp.interp(t[0], t_in, al)
            s = jnp.interp(t[0], t_in, si)
            eps = 0.1 * x
            x0 = (x - s * eps) / a
            return (a * x - x0) / s

        cond = jnp.zeros((1, 7, 8))
        key = rng_lib.key_for_seed(5)
        ref = sample_loop(
            identity_eps_model, SCHED, steps=8, shape=SHAPE, cond=cond,
            sampler_name="UniPC", key=key,
        )
        out = sample_loop(
            v_model, SCHED, steps=8, shape=SHAPE, cond=cond,
            sampler_name="UniPC", key=key, parameterization="v",
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-4)

    def test_train_loss_targets(self):
        from t2v.diffusion.schedules import DiffusionSchedule
        from t2v.parallel.train import diffusion_loss, schedule_tables

        tables = schedule_tables(SCHED)
        batch = {
            "latents": jnp.ones(SHAPE) * 0.5,
            "context": jnp.zeros((1, 7, 8)),
        }
        key = jax.random.key(0)

        losses = {}
        for pz in ("eps", "x0", "v"):
            losses[pz] = float(
                diffusion_loss(
                    lambda p, x, t, c: jnp.zeros_like(x), None, tables, batch,
                    key, pz,
                )
            )
        # zero prediction: eps-loss = E[noise^2] ~ 1, x0-loss = 0.25 exactly
        assert abs(losses["x0"] - 0.25) < 1e-6
        assert losses["eps"] != losses["x0"] != losses["v"]

    def test_pipeline_honours_parameterization(self):
        """A v-parameterized tiny pipeline must produce different latents
        from the same weights interpreted as eps (the config field reaches
        the sampler)."""
        import dataclasses

        from t2v.core.config import ModelScopeUNetConfig, T2VArgs
        from t2v.pipeline.pipeline import ModelScopePipeline

        args = T2VArgs(
            prompt="x", n_prompt="n", steps=4, frames=2, width=32, height=32,
            seed=7, sampler="DDIM",
        )
        pipe = ModelScopePipeline.random_init()
        # perturb zero-init gates so the UNet output is nonzero
        pipe = dataclasses.replace(
            pipe,
            unet_params=jax.tree.map(
                lambda a: a + 0.01 if a.size and not np.asarray(a).any() else a,
                pipe.unet_params,
            ),
        )
        ref = pipe.infer(args)
        pipe_v = dataclasses.replace(
            pipe,
            unet_cfg=dataclasses.replace(pipe.unet_cfg, parameterization="v"),
            _sample_cache={},
        )
        out = pipe_v.infer(args)
        assert not np.allclose(
            np.asarray(out.latents), np.asarray(ref.latents), atol=1e-5
        )


class TestDDPMClipDenoised:
    """The LVDM ddpm path must NOT clip x0: LatentDiffusion sets
    clip_denoised=False (ddpm3d.py:540) and latents routinely exceed +/-1.
    Round-4 review caught the VC call site using the pixel-space default."""

    def test_unclipped_matches_numpy_recursion(self):
        import jax
        import jax.numpy as jnp

        from t2v.core import rng as rng_lib
        from t2v.diffusion import ddpm as ddpm_mod
        from t2v.diffusion.schedules import DiffusionSchedule

        sched = DiffusionSchedule.linear_sd(8)
        key = jax.random.key(0)
        # x0 predictions far outside [-1, 1]: eps == 0 makes x0 = sr[t] * x
        x = 5.0 * jnp.ones((1, 2, 4, 4, 3), jnp.float32)
        eps_fn = lambda xc, t, i: jnp.zeros_like(xc)

        got = np.asarray(
            ddpm_mod.sample(eps_fn, sched, x, key, clip_denoised=False)
        )
        clipped = np.asarray(
            ddpm_mod.sample(eps_fn, sched, x, key, clip_denoised=True)
        )

        T = sched.num_timesteps
        noise_key = rng_lib.stream(key, "ddpm_noise")
        xc = np.asarray(x, np.float32)
        for i in range(T):
            t = T - 1 - i
            x0 = sched.sqrt_recip_alphas_cumprod[t] * xc
            mean = (
                sched.posterior_mean_coef1[t] * x0
                + sched.posterior_mean_coef2[t] * xc
            )
            n = np.asarray(
                jax.random.normal(jax.random.fold_in(noise_key, i), xc.shape)
            )
            nz = 1.0 if t != 0 else 0.0
            xc = mean + nz * np.exp(
                0.5 * sched.posterior_log_variance_clipped[t]
            ) * n
        np.testing.assert_allclose(got, xc, rtol=1e-5, atol=1e-5)
        assert not np.allclose(got, clipped), "clip flag does not route"

    def test_vc_ddpm_path_does_not_clip(self):
        """The pipeline's sample_type='ddpm' output must match the
        unclipped module call bit-for-bit."""
        import jax
        import jax.numpy as jnp

        from t2v.core import rng as rng_lib
        from t2v.core.config import T2VArgs
        from t2v.diffusion import ddpm as ddpm_mod
        from t2v.diffusion.sampling import make_eps_fn
        from t2v.pipeline.videocrafter import VideoCrafterPipeline

        pipe = VideoCrafterPipeline.random_init()
        pipe.unet_params = jax.tree.map(
            lambda a: a + 0.05 if a.size and not np.asarray(a).any() else a,
            pipe.unet_params,
        )
        args = T2VArgs(
            prompt="a cat", n_prompt="bad", steps=2, frames=2, width=32,
            height=32, seed=7, cfg_scale=4.0,
        )
        res = pipe.infer(args, sample_type="ddpm")

        cond = pipe.encode_text([args.prompt])
        uncond = pipe.encode_text([args.n_prompt])
        apply_fn = pipe.make_apply_fn()
        from t2v.pipeline.videocrafter import _spatial_scale

        key = rng_lib.key_for_seed(rng_lib.resolve_seed(args.seed))
        ss = _spatial_scale(pipe.vae_cfg)
        shape = (1, args.frames, args.height // ss, args.width // ss,
                 pipe.cfg.in_channels)
        eps_fn = make_eps_fn(
            apply_fn, cond, uncond, args.cfg_scale, "full",
            parameterization=pipe.cfg.parameterization,
            schedule=pipe.schedule,
        )
        noise = rng_lib.latent_noise(key, shape)
        want = ddpm_mod.sample(
            eps_fn, pipe.schedule, noise, key, clip_denoised=False
        )
        np.testing.assert_allclose(
            np.asarray(res.latents), np.asarray(want), atol=1e-5
        )

"""Import shims that make the reference's model code importable here.

The reference (/root/reference) is an A1111 extension: its modules import
``modules.*`` (the A1111 host runtime), ``ldm.*`` (the stable-diffusion
package) and ``open_clip`` — none of which exist in this image. For the
real-checkpoint parity harness we only need the *model math* (UNetSD,
AutoencoderKL, the gaussian DDIM sampler), so this installs minimal stand-ins
before any reference import:

  * ``modules.shared`` opts/cmd_opts/state — attribute bags with inert
    defaults (CPU, no xformers; ``opt_sdp_attention=True`` so attention
    uses torch SDP, the reference's default torch-2 path);
  * ``modules.prompt_parser.reconstruct_cond_batch`` — identity on plain
    tensors (we drive the sampler with already-materialised conds);
  * ``ldm.modules.diffusionmodules.model.Encoder/Decoder`` — the
    reference's *own* SD-VAE copies from
    scripts/videocrafter/lvdm/models/modules/autoencoder_modules.py
    (the lvdm file documents itself as the same blocks the ldm package
    provides, so AutoencoderKL wires up identically);
  * ``ldm.modules.distributions`` — lvdm's DiagonalGaussianDistribution.

Nothing here is product code: it exists so the *golden* side of the parity
comparison is the reference's genuine torch implementation.
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference"
_installed = False


class _Bag:
    """Attribute bag: unset attributes resolve to the given default."""

    def __init__(self, default=None, **kw):
        self.__dict__.update(kw)
        self._default = default

    def __getattr__(self, name):
        return self.__dict__.get("_default")


def install() -> None:
    global _installed
    if _installed:
        return
    for p in (f"{REF}/scripts", f"{REF}/scripts/videocrafter"):
        if p not in sys.path:
            sys.path.insert(0, p)

    def mod(name: str) -> types.ModuleType:
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            sys.modules[name] = m
        return m

    shared = mod("modules.shared")
    shared.opts = _Bag(default=None)
    shared.cmd_opts = _Bag(default=False, opt_sdp_attention=True, lora_dir="")
    shared.state = _Bag(
        default=None, interrupted=False, skipped=False,
        sampling_step=0, sampling_steps=0, job_no=0, job_count=0,
    )
    shared.device = "cpu"
    shared.xformers_available = False

    pp = mod("modules.prompt_parser")
    pp.reconstruct_cond_batch = lambda c, step: c

    ssc = mod("modules.sd_samplers_common")

    class InterruptedException(Exception):
        pass

    ssc.InterruptedException = InterruptedException

    sho = mod("modules.sd_hijack_optimizations")
    sho.get_xformers_flash_attention_op = lambda *a, **k: None

    paths = mod("modules.paths")
    paths.models_path = "/tmp/parity/models"

    modules_pkg = mod("modules")
    modules_pkg.paths = paths
    modules_pkg.shared = shared
    modules_pkg.prompt_parser = pp
    modules_pkg.sd_samplers_common = ssc
    modules_pkg.sd_hijack_optimizations = sho

    # --- ldm ---------------------------------------------------------------
    from lvdm.models.modules import autoencoder_modules as ae_mod
    from lvdm.models.modules import distributions as dist_mod

    ldm_util = mod("ldm.util")

    def instantiate_from_config(*a, **k):  # pragma: no cover - never hit
        raise RuntimeError("instantiate_from_config stub called")

    ldm_util.instantiate_from_config = instantiate_from_config

    ldm_model = mod("ldm.modules.diffusionmodules.model")
    ldm_model.Encoder = ae_mod.Encoder
    ldm_model.Decoder = ae_mod.Decoder

    import numpy as np
    import torch

    ldm_dm_util = mod("ldm.modules.diffusionmodules.util")

    def make_beta_schedule(schedule, n_timestep, linear_start=1e-4,
                          linear_end=2e-2, cosine_s=8e-3):
        # ldm semantics: "linear" interpolates in sqrt-beta space
        if schedule == "linear":
            betas = (
                torch.linspace(linear_start ** 0.5, linear_end ** 0.5,
                               n_timestep, dtype=torch.float64) ** 2
            )
            return betas.numpy()
        raise NotImplementedError(schedule)

    ldm_dm_util.make_beta_schedule = make_beta_schedule
    # the reference's lvdm tree carries its own copies of the remaining ldm
    # helpers (lvdm/models/modules/util.py:36-88,321) — reuse them verbatim
    from lvdm.models.modules import util as lvdm_util

    ldm_dm_util.make_ddim_timesteps = lvdm_util.make_ddim_timesteps
    ldm_dm_util.make_ddim_sampling_parameters = lvdm_util.make_ddim_sampling_parameters
    ldm_dm_util.extract_into_tensor = lvdm_util.extract_into_tensor
    ldm_dm_util.noise_like = lvdm_util.noise_like

    ldm_dist = mod("ldm.modules.distributions.distributions")
    ldm_dist.DiagonalGaussianDistribution = dist_mod.DiagonalGaussianDistribution

    ldm_pkg = mod("ldm")
    ldm_pkg.util = ldm_util
    ldm_modules = mod("ldm.modules")
    ldm_dm = mod("ldm.modules.diffusionmodules")
    ldm_dm.model = ldm_model
    ldm_dm.util = ldm_dm_util
    ldm_distributions = mod("ldm.modules.distributions")
    ldm_distributions.distributions = ldm_dist
    ldm_modules.diffusionmodules = ldm_dm
    ldm_modules.distributions = ldm_distributions
    ldm_pkg.modules = ldm_modules

    _installed = True

from t2v.models.modelscope_unet import UNetSD
from t2v.models.vae import AutoencoderKL

__all__ = ["UNetSD", "AutoencoderKL"]

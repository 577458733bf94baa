from t2v.core.config import (
    CLIPTextConfig,
    ModelScopeUNetConfig,
    T2VArgs,
    T2VOutputArgs,
    VAEConfig,
    sanity_check_args,
)
from t2v.core.dtypes import Policy

__all__ = [
    "CLIPTextConfig",
    "ModelScopeUNetConfig",
    "T2VArgs",
    "T2VOutputArgs",
    "VAEConfig",
    "sanity_check_args",
    "Policy",
]

from t2v.io.pickle_reader import load_torch_checkpoint
from t2v.io.safetensors_io import load_safetensors

__all__ = ["load_torch_checkpoint", "load_safetensors"]

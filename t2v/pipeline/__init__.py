from t2v.pipeline.keyframes import KeyFrameSeries, parse_key_frames
from t2v.pipeline.pipeline import ModelScopePipeline, load_pipeline

__all__ = [
    "KeyFrameSeries",
    "parse_key_frames",
    "ModelScopePipeline",
    "load_pipeline",
]

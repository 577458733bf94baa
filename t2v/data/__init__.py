from t2v.data.webvid import WebVidDataset

__all__ = ["WebVidDataset"]

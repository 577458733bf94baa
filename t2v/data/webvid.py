"""WebVid-style training data loader.

Host-side equivalent of the reference's LVDM training dataset
(lvdm webvid.py:14-188): CSV metadata (videoid, name/caption, page_dir),
video decoding with frame stride and fps-conditioned sampling, random or
center crop + resize, frames scaled to [-1, 1].

Differences from the reference (by design, TPU-first):
  * decord → cv2 (decord is not in this image; cv2 bundles FFmpeg);
  * a background-thread prefetcher keeps the device fed — batches are
    assembled on host and shipped once per step (host↔device transfer is
    one contiguous array per batch);
  * deterministic per-epoch shuffling from a seed.
"""

from __future__ import annotations

import csv
import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional

import cv2
import numpy as np


@dataclass
class WebVidSample:
    frames: np.ndarray  # (F, H, W, 3) float32 in [-1, 1]
    caption: str
    video_path: str


class WebVidDataset:
    def __init__(
        self,
        data_dir: str,
        meta_path: Optional[str] = None,
        *,
        video_length: int = 16,
        resolution: tuple[int, int] = (256, 256),
        frame_stride: int = 1,
        crop: str = "random",  # "random" | "center"
        seed: int = 0,
        subsample: Optional[int] = None,
    ):
        self.data_dir = data_dir
        self.video_length = video_length
        self.resolution = resolution
        self.frame_stride = frame_stride
        self.crop = crop
        self.rng = np.random.default_rng(seed)

        meta_path = meta_path or self._find_meta(data_dir)
        self.entries = self._read_meta(meta_path)
        if subsample:
            self.entries = self.entries[:subsample]

    @staticmethod
    def _find_meta(data_dir: str) -> str:
        for name in os.listdir(data_dir):
            if name.endswith(".csv"):
                return os.path.join(data_dir, name)
        raise FileNotFoundError(f"no metadata csv under {data_dir}")

    def _read_meta(self, meta_path: str) -> list[dict]:
        with open(meta_path, newline="") as f:
            return list(csv.DictReader(f))

    def __len__(self) -> int:
        return len(self.entries)

    def _video_path(self, entry: dict) -> str:
        page_dir = entry.get("page_dir", "")
        vid = entry.get("videoid") or entry.get("video_id") or entry.get("id")
        return os.path.join(self.data_dir, "videos", page_dir, f"{vid}.mp4")

    def _load_clip(self, path: str) -> Optional[np.ndarray]:
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            return None
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        need = self.video_length * self.frame_stride
        if total < need:
            cap.release()
            return None
        start = int(self.rng.integers(0, total - need + 1))
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        frames = []
        idx = 0
        while len(frames) < self.video_length:
            ok, frame = cap.read()
            if not ok:
                break
            if idx % self.frame_stride == 0:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            idx += 1
        cap.release()
        if len(frames) < self.video_length:
            return None
        return np.stack(frames)

    def _crop_resize(self, frames: np.ndarray) -> np.ndarray:
        f, h, w, _ = frames.shape
        th, tw = self.resolution
        scale = max(th / h, tw / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        frames = np.stack(
            [cv2.resize(fr, (nw, nh), interpolation=cv2.INTER_AREA) for fr in frames]
        )
        if self.crop == "random":
            y0 = int(self.rng.integers(0, nh - th + 1))
            x0 = int(self.rng.integers(0, nw - tw + 1))
        else:
            y0, x0 = (nh - th) // 2, (nw - tw) // 2
        return frames[:, y0 : y0 + th, x0 : x0 + tw]

    def __getitem__(self, index: int) -> Optional[WebVidSample]:
        entry = self.entries[index]
        path = self._video_path(entry)
        clip = self._load_clip(path)
        if clip is None:
            return None
        clip = self._crop_resize(clip)
        frames = clip.astype(np.float32) / 255.0 * 2.0 - 1.0
        caption = entry.get("name") or entry.get("caption") or ""
        return WebVidSample(frames=frames, caption=caption, video_path=path)

    def batches(
        self, batch_size: int, *, epochs: int = 1, prefetch: int = 2
    ) -> Iterator[tuple[np.ndarray, list[str]]]:
        """Yield (frames (B,F,H,W,3), captions) with background prefetch."""
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        DONE = object()

        def producer():
            # any failure must still unblock the consumer: ship the
            # exception through the queue instead of dying silently
            try:
                for _ in range(epochs):
                    order = self.rng.permutation(len(self.entries))
                    buf_frames, buf_caps = [], []
                    for i in order:
                        sample = self[int(i)]
                        if sample is None:
                            continue
                        buf_frames.append(sample.frames)
                        buf_caps.append(sample.caption)
                        if len(buf_frames) == batch_size:
                            q.put((np.stack(buf_frames), buf_caps))
                            buf_frames, buf_caps = [], []
            except BaseException as e:  # noqa: BLE001
                q.put(e)
            else:
                q.put(DONE)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

from t2v.media.video import (
    ffmpeg_stitch_video,
    find_ffmpeg_binary,
    frames_to_video,
    get_quick_vid_info,
    vid2frames,
)

__all__ = [
    "ffmpeg_stitch_video",
    "find_ffmpeg_binary",
    "frames_to_video",
    "get_quick_vid_info",
    "vid2frames",
]

"""Video IO (reference common/utils/video_utils.py:206), cv2-based
(ffmpeg-binary-free)."""

import numpy as np


def write_video(path, frames, fps=20):
    """frames: list/array of (H, W, 3) float [0,1] or uint8 -> mp4."""
    import cv2

    first = np.asarray(frames[0])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        f = np.asarray(f)
        if f.dtype != np.uint8:
            f = (np.clip(f, 0, 1) * 255).astype(np.uint8)
        writer.write(f[..., ::-1])
    writer.release()
    return path


def read_video(path, max_frames=None, every_n=1):
    """mp4 -> list of (H, W, 3) uint8 rgb frames."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % every_n == 0:
            frames.append(frame[..., ::-1])
            if max_frames and len(frames) >= max_frames:
                break
        idx += 1
    cap.release()
    return frames


def get_video_metadata(path):
    import cv2

    cap = cv2.VideoCapture(path)
    meta = {
        "fps": cap.get(cv2.CAP_PROP_FPS),
        "n_frames": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
    }
    cap.release()
    return meta

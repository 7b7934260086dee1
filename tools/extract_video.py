"""Video -> frames extraction (reference tools/extract_video.py).

Usage: python tools/extract_video.py --video_path v.MOV --scene_dir data/Capture/scene \
         [--video_downsample 2] [--image_downsample 2]
Writes scene_dir/images/ frames via cv2 (ffmpeg-free).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import cv2

    parser = argparse.ArgumentParser()
    parser.add_argument("--video_path", required=True)
    parser.add_argument("--scene_dir", required=True)
    parser.add_argument("--video_downsample", type=int, default=1, help="keep every n-th frame")
    parser.add_argument("--image_downsample", type=float, default=1.0, help="resolution divide factor")
    args = parser.parse_args()

    out_dir = os.path.join(args.scene_dir, "images")
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(args.video_path)
    idx = kept = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % args.video_downsample == 0:
            if args.image_downsample > 1:
                frame = cv2.resize(
                    frame,
                    (int(frame.shape[1] / args.image_downsample), int(frame.shape[0] / args.image_downsample)),
                    interpolation=cv2.INTER_AREA,
                )
            cv2.imwrite(os.path.join(out_dir, "img_{:05d}.png".format(kept)), frame)
            kept += 1
        idx += 1
    cap.release()
    print("wrote {} frames to {}".format(kept, out_dir))


if __name__ == "__main__":
    main()

"""Minimal library usage: track a video file.

Run from the repo root:  python examples/quickstart.py video.mp4
"""

import sys

import cv2

import botsort_tpu


def main(path: str):
    bundle = botsort_tpu.build_bundle(weights_dir="weights")
    tracker = botsort_tpu.BoTSORTPipeline(bundle)

    cap = cv2.VideoCapture(path)
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        for t in tracker.update(frame):
            x1, y1, x2, y2 = (int(v) for v in t.tlbr)
            print(f"frame {tracker.frame_id}: id={t.track_id} "
                  f"box=({x1},{y1},{x2},{y2}) score={t.score:.2f}")
    cap.release()


if __name__ == "__main__":
    main(sys.argv[1])

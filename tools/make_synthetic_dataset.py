#!/usr/bin/env python
"""Generate the synthetic road-signs dataset used by benchmarks/quality
runs (docs/BENCHMARKS.md "Training quality").

The reference's README trains on 107-class Russian traffic signs
(``README.md:99-105``) — unavailable offline, so classes here are
procedurally distinct sign-like images: background color x shape x
border, with per-image jitter (position, scale, rotation, noise,
illumination) supplying the intra-class variance that makes metric
learning non-trivial.

Usage: python tools/make_synthetic_dataset.py OUT_DIR \
          [--classes 107] [--per-class 40] [--size 96] [--seed 0]
"""

import argparse
import os

import cv2
import numpy as np

PALETTE = [(40, 40, 200), (40, 160, 40), (200, 60, 40), (30, 170, 200),
           (160, 40, 160), (200, 170, 40), (90, 90, 90), (200, 120, 160)]
SHAPES = ("circle", "square", "triangle", "diamond", "ring", "hbar", "cross")


def draw_sign(size, color, shape, border, rng):
    img = np.full((size, size, 3),
                  rng.integers(150, 230, 3, dtype=np.uint8)[None, None, :],
                  np.uint8)
    c = size // 2 + rng.integers(-size // 10, size // 10 + 1, 2)
    r = int(size * rng.uniform(0.28, 0.40))
    col = tuple(int(np.clip(v + rng.integers(-25, 26), 0, 255))
                for v in color)
    if shape == "circle":
        cv2.circle(img, tuple(c), r, col, -1)
    elif shape == "ring":
        cv2.circle(img, tuple(c), r, col, max(2, r // 3))
    elif shape == "square":
        cv2.rectangle(img, (c[0] - r, c[1] - r), (c[0] + r, c[1] + r),
                      col, -1)
    elif shape == "triangle":
        pts = np.array([[c[0], c[1] - r], [c[0] - r, c[1] + r],
                        [c[0] + r, c[1] + r]])
        cv2.fillPoly(img, [pts], col)
    elif shape == "diamond":
        pts = np.array([[c[0], c[1] - r], [c[0] - r, c[1]],
                        [c[0], c[1] + r], [c[0] + r, c[1]]])
        cv2.fillPoly(img, [pts], col)
    elif shape == "hbar":
        cv2.rectangle(img, (c[0] - r, c[1] - r // 3),
                      (c[0] + r, c[1] + r // 3), col, -1)
    elif shape == "cross":
        cv2.rectangle(img, (c[0] - r // 3, c[1] - r),
                      (c[0] + r // 3, c[1] + r), col, -1)
        cv2.rectangle(img, (c[0] - r, c[1] - r // 3),
                      (c[0] + r, c[1] + r // 3), col, -1)
    if border:
        cv2.circle(img, tuple(c), int(r * 1.15), (20, 20, 20), 2)
    # rotation + illumination + noise jitter
    angle = float(rng.uniform(-15, 15))
    mat = cv2.getRotationMatrix2D((size / 2, size / 2), angle, 1.0)
    img = cv2.warpAffine(img, mat, (size, size),
                         borderMode=cv2.BORDER_REFLECT)
    gain = rng.uniform(0.75, 1.25)
    noise = rng.normal(0, 8, img.shape)
    return np.clip(img.astype(np.float32) * gain + noise,
                   0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--classes", type=int, default=107)
    ap.add_argument("--per-class", type=int, default=40)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    specs = [(color, shape, border)
             for border in (False, True)
             for shape in SHAPES
             for color in PALETTE][:args.classes]
    assert len(specs) == args.classes, \
        f"can synthesize at most {2 * len(SHAPES) * len(PALETTE)} classes"

    rng = np.random.default_rng(args.seed)
    for cls, (color, shape, border) in enumerate(specs):
        d = os.path.join(args.out_dir, f"sign_{cls:03d}")
        os.makedirs(d, exist_ok=True)
        for i in range(args.per_class):
            img = draw_sign(args.size, color, shape, border, rng)
            cv2.imwrite(os.path.join(d, f"img_{i:03d}.png"), img)
    print(f"wrote {args.classes} classes x {args.per_class} images "
          f"@{args.size}px to {args.out_dir}")


if __name__ == "__main__":
    main()

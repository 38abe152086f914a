"""Host-side image IO.

Same decode contract as the reference (``embedding_net/utils.py:13-25``):
cv2 ``imread`` (**BGR** channel order) + cv2 bilinear ``resize`` to
``(input_shape[0], input_shape[1])``. Matching BGR and cv2's resize exactly
is required for the <1e-5 embedding-parity target (SURVEY.md §6).

Images stay uint8 on host; the ``/255.`` scaling happens on device
(the reference scales on host, ``datagenerators.py:156``).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import cv2
import numpy as np

log = logging.getLogger(__name__)


def get_image(img_path: str,
              input_shape: Optional[Sequence[int]] = None) -> Optional[np.ndarray]:
    """BGR uint8 image, resized to ``(input_shape[0], input_shape[1])`` =
    (H, W).

    Missing/corrupt file -> logs and returns None (reference prints and
    returns None, ``utils.py:15-17``).

    Deliberate deviation: the reference passes ``(input_shape[0],
    input_shape[1])`` directly as cv2 ``dsize`` (``utils.py:19``), but
    cv2's dsize is (width, height) — for non-square inputs the reference
    therefore produces transposed images that crash its own model. Here
    dsize is ``(W, H)`` so the output is always ``[H, W, 3]``, matching
    the batch buffers, the native C++ decoder, and MODEL.input_shape.
    Identical to the reference for the square shapes it ships.
    """
    img = cv2.imread(img_path)
    if img is None:
        log.warning("image does not exist: %s", img_path)
        return None
    if input_shape:
        img = cv2.resize(img, (input_shape[1], input_shape[0]))
    return img


def get_images(img_paths: Sequence[str],
               input_shape: Optional[Sequence[int]] = None) -> np.ndarray:
    """Stacked uint8 batch (``utils.py:23-25``); missing files are dropped
    (the reference would crash on np.array of ragged None — fixed here)."""
    imgs = [get_image(p, input_shape) for p in img_paths]
    imgs = [im for im in imgs if im is not None]
    return np.array(imgs)

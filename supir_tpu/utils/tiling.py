"""Tiling geometry for tiled diffusion and tiled VAE.

All geometry is computed host-side from static shapes, so tiled execution
compiles to fixed gather/scatter index tables (no dynamic shapes under jit).

Behavioral contract: `sliding_windows` and `gaussian_weights` match the
reference (`sgm/modules/diffusionmodules/sampling.py:733-766`); VAE tile
splitting matches the padded-tile geometry of `SUPIR/utils/tilevae.py:686-760`
(pad 32 px encoder / 11 px decoder).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np


def sliding_windows(h: int, w: int, tile_size: int, tile_stride: int) -> List[Tuple[int, int, int, int]]:
    """(hi, hi_end, wi, wi_end) tile coords covering an h x w canvas.

    Tiles start every `tile_stride`; a final tile flush with the edge is added
    when the stride does not land exactly. Matches `_sliding_windows`
    (sampling.py:753-765)."""
    hi_list = list(range(0, h - tile_size + 1, tile_stride))
    if (h - tile_size) % tile_stride != 0:
        hi_list.append(h - tile_size)
    wi_list = list(range(0, w - tile_size + 1, tile_stride))
    if (w - tile_size) % tile_stride != 0:
        wi_list.append(w - tile_size)
    return [(hi, hi + tile_size, wi, wi + tile_size) for hi in hi_list for wi in wi_list]


def gaussian_weights(tile_width: int, tile_height: int) -> np.ndarray:
    """[tile_height, tile_width] float32 Gaussian blend weights for seamless
    tile merging (matches `gaussian_weights`, sampling.py:733-750; note the
    reference's asymmetric midpoints: (w-1)/2 for x but h/2 for y)."""
    var = 0.01
    mid_x = (tile_width - 1) / 2
    x_probs = np.array(
        [
            math.exp(-(x - mid_x) ** 2 / (tile_width * tile_width) / (2 * var))
            / math.sqrt(2 * math.pi * var)
            for x in range(tile_width)
        ]
    )
    mid_y = tile_height / 2
    y_probs = np.array(
        [
            math.exp(-(y - mid_y) ** 2 / (tile_height * tile_height) / (2 * var))
            / math.sqrt(2 * math.pi * var)
            for y in range(tile_height)
        ]
    )
    return np.outer(y_probs, x_probs).astype(np.float32)


def vae_tile_grid(
    h: int, w: int, tile_size: int, pad: int
) -> Tuple[List[Tuple[int, int]], List[Tuple[int, int]]]:
    """Row/col split of an image into padded VAE tiles.

    Returns (rows, cols) where each entry is the (start, end) of the *valid*
    (unpadded) region; the actual input tile is the valid region extended by
    `pad` on each side and clamped to the canvas. Tile count per axis follows
    the reference heuristic (tilevae.py:717-760): ceil(size / tile_size) with
    a minimum real tile extent of about tile_size/2 to amortize the padding.
    """

    def split(length: int) -> List[Tuple[int, int]]:
        num = math.ceil(length / tile_size)
        # avoid a sliver tile: if the last tile would be tiny, merge it
        if num > 1 and length - (num - 1) * tile_size < tile_size // 2:
            num -= 1
        size = math.ceil(length / num)
        return [(i * size, min((i + 1) * size, length)) for i in range(num)]

    return split(h), split(w)


def padded_bbox(start: int, end: int, pad: int, limit: int) -> Tuple[int, int]:
    """Extend a valid region by pad on each side, clamped to [0, limit]."""
    return max(0, start - pad), min(limit, end + pad)


def plan_vae_tiles(h: int, w: int, tile_size: int, pad: int):
    """Full tile plan: list of dicts with input bbox (padded, clamped) and
    the slice of the tile output that is valid, in input coordinates."""
    rows, cols = vae_tile_grid(h, w, tile_size, pad)
    tiles = []
    for (r0, r1) in rows:
        for (c0, c1) in cols:
            pr0, pr1 = padded_bbox(r0, r1, pad, h)
            pc0, pc1 = padded_bbox(c0, c1, pad, w)
            tiles.append(
                dict(
                    in_bbox=(pr0, pr1, pc0, pc1),
                    valid_bbox=(r0, r1, c0, c1),
                    # valid region relative to the padded tile
                    rel_bbox=(r0 - pr0, r1 - pr0, c0 - pc0, c1 - pc0),
                )
            )
    return tiles

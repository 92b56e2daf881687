"""Tiling geometry tests (sliding windows, Gaussian blend, VAE tile plan)."""

import numpy as np

from supir_tpu.utils.tiling import (
    gaussian_weights,
    padded_bbox,
    plan_vae_tiles,
    sliding_windows,
    vae_tile_grid,
)


def test_sliding_windows_exact_cover():
    # 128 canvas, tile 64, stride 32 -> starts 0,32,64 per axis
    coords = sliding_windows(128, 128, 64, 32)
    his = sorted({c[0] for c in coords})
    assert his == [0, 32, 64]
    assert len(coords) == 9
    assert all(c[1] - c[0] == 64 and c[3] - c[2] == 64 for c in coords)


def test_sliding_windows_edge_tile():
    # 90 canvas, tile 64, stride 32: starts [0] + flush tile at 26
    coords = sliding_windows(90, 90, 64, 32)
    his = sorted({c[0] for c in coords})
    assert his == [0, 26]
    assert max(c[1] for c in coords) == 90


def test_sliding_windows_single_tile():
    coords = sliding_windows(64, 64, 64, 32)
    assert coords == [(0, 64, 0, 64)]


def test_gaussian_weights_properties():
    w = gaussian_weights(64, 64)
    assert w.shape == (64, 64)
    assert np.all(w > 0)
    # symmetric in x (midpoint (w-1)/2)
    np.testing.assert_allclose(w, w[:, ::-1], rtol=1e-6)
    # peak near the middle
    assert w.max() == w[31:33, 31:33].max()


def test_gaussian_weights_spot_value():
    # direct evaluation of the formula at the x midpoint, y=0
    import math

    w = gaussian_weights(4, 4)
    var = 0.01
    norm = math.sqrt(2 * math.pi * var)
    y_term = math.exp(-((0 - 2.0) ** 2) / 16.0 / (2 * var)) / norm  # mid_y = h/2
    x_term = math.exp(-((1 - 1.5) ** 2) / 16.0 / (2 * var)) / norm  # mid_x = (w-1)/2
    np.testing.assert_allclose(w[0, 1] * 1.0, y_term * x_term, rtol=1e-5)


def test_vae_tile_grid_merges_slivers():
    rows, _ = vae_tile_grid(1030, 1030, 512, 32)
    # 1030/512 -> 3 tiles of ~344 (sliver 6px last tile merged: 1030-1024=6 < 256)
    assert len(rows) == 2 or len(rows) == 3
    assert rows[0][0] == 0 and rows[-1][1] == 1030
    # contiguous non-overlapping
    for (a, b), (c, d) in zip(rows, rows[1:]):
        assert b == c


def test_padded_bbox_clamps():
    assert padded_bbox(0, 100, 32, 500) == (0, 132)
    assert padded_bbox(400, 500, 32, 500) == (368, 500)


def test_plan_vae_tiles_valid_regions_tile_canvas():
    h = w = 300
    tiles = plan_vae_tiles(h, w, 128, 32)
    canvas = np.zeros((h, w), np.int32)
    for t in tiles:
        r0, r1, c0, c1 = t["valid_bbox"]
        canvas[r0:r1, c0:c1] += 1
        pr0, pr1, pc0, pc1 = t["in_bbox"]
        rr0, rr1, rc0, rc1 = t["rel_bbox"]
        # rel bbox maps valid region into the padded tile
        assert pr0 + rr0 == r0 and pr0 + rr1 == r1
        assert pc0 + rc0 == c0 and pc0 + rc1 == c1
        assert 0 <= pr0 <= r0 and r1 <= pr1 <= h
    # exact partition: every pixel covered exactly once
    assert canvas.min() == 1 and canvas.max() == 1

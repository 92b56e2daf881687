"""End-to-end CLI smoke: `test.py` (apps/cli.py), the reference's primary
product surface (reference test.py flag set), driven in-process with tiny
random weights — image in, restored image out."""

import os

import numpy as np
from PIL import Image


def test_cli_tiny_end_to_end(tmp_path):
    from supir_tpu.apps.cli import main

    img_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (48, 56, 3), dtype=np.uint8)
    ).save(str(img_dir / "photo.png"))

    main([
        "--img_dir", str(img_dir),
        "--save_dir", str(out_dir),
        "--tiny", "--random_weights", "--no_llava",
        "--upscale", "1", "--min_size", "64",
        "--edm_steps", "2", "--num_samples", "1",
    ])

    outs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert outs, os.listdir(out_dir)
    got = np.asarray(Image.open(str(out_dir / outs[0])))
    # reference contract (test.py + util.py:60-79): the model runs at the
    # 64-rounded min_size resolution, but the saved image is resized back
    # to h0 x w0 = original x upscale
    assert got.shape == (48, 56, 3), got.shape

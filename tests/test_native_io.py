"""Native data-plane parser (native/fastio.c) vs the numpy path."""

import numpy as np

from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils import native
from trifocal_pose_estimation_using_improved_gpuhc_tpu.utils.config import (
    EngineConfig,
    ransac_data_dir,
)


def test_parse_floats_matches_numpy(cfg):
    import os

    p = os.path.join(
        ransac_data_dir(cfg), "Triplet_Edgels", "Triplet_Edgels_000.txt"
    )
    a = native.parse_floats(p)
    b = np.loadtxt(p).reshape(-1)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_parse_floats_fallback(monkeypatch, tmp_path):
    f = tmp_path / "x.txt"
    f.write_text("1.5 -2  3e4\n\t7.25\n")
    # Force the numpy fallback path.
    monkeypatch.setattr(native, "_load", lambda: None)
    np.testing.assert_allclose(
        native.parse_floats(str(f)), [1.5, -2.0, 3e4, 7.25]
    )
    monkeypatch.undo()
    # And whichever path is active by default handles ragged rows too.
    np.testing.assert_allclose(
        native.parse_floats(str(f)), [1.5, -2.0, 3e4, 7.25]
    )

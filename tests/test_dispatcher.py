"""dspfun dispatcher tests."""

import numpy as np

from dspfun_tpu.io import images
from dspfun_tpu.tools import main as dispatcher


def test_lists_tools(capsys):
    assert dispatcher.main([]) == 1
    err = capsys.readouterr().err
    for name in ("spec", "ispec", "motion", "rotate", "transcode",
                 "applybasis", "genbasis", "draw", "zoom", "scan"):
        assert name in err


def test_unknown_tool(capsys):
    assert dispatcher.main(["nope"]) == 1
    assert "unknown tool" in capsys.readouterr().err


def test_dispatches_to_draw(tmp_path):
    out = str(tmp_path / "d.png")
    assert dispatcher.main(["draw", "-b", "8x8", "-f", "1x1:0.5", out]) == 0
    img = images.read_image(out, channels="I").pixels
    assert img.shape == (8, 8, 1)
    assert np.any(img != img[0, 0])

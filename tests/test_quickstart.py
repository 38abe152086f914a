"""examples/quickstart.py must keep running end-to-end — it is the
advertised user journey (README "Quick start"). Runs the script in-process
on the CPU test backend and checks it reaches the recall line."""

import os
import runpy
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quickstart_end_to_end(capsys):
    sys.argv = ["quickstart.py"]
    runpy.run_path(os.path.join(REPO, "examples", "quickstart.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "exported:" in out
    assert "predicted=" in out
    assert "val recall: top1=" in out

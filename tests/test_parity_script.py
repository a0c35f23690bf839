"""The real-data parity driver is one file-drop away from running (r1 item 7)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "parity_check", os.path.join(REPO, "scripts", "parity_check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tolerance_check_logic(capsys):
    mod = _load()
    good = dict(mod.PUBLISHED_P1["gt"])
    assert mod.check(good, "gt", tolerance=0.5) == 0
    bad = {k: v + 1.0 for k, v in good.items()}
    assert mod.check(bad, "gt", tolerance=0.5) == 1
    missing = dict(good)
    missing.pop("Walking")
    assert mod.check(missing, "gt", tolerance=0.5) == 1
    capsys.readouterr()


def test_fabricated_pipeline_end_to_end():
    """Fabricated npz pair + random reference-ABI .pth checkpoints through
    the FULL eval path (conversion → lift → DDIM → per-action table)."""
    mod = _load()
    assert mod.run_fabricated() == 0

"""Every cookbook example runs in CI (VERDICT round-1 item 10): the
examples are the framework's documentation narratives — they assert their
own claims, so running them is the doctest layer (reference analog:
noxfile.py:136-148 xdoctest + docs/cookbook/active/*.ipynb).

The four reference-notebook counterparts (intro, GFI, choice maps,
debugging) and the other light cookbooks run in the fast default lane;
the heavy inference narratives carry the ``slow`` marker and run in the
slow lane (``-m slow``)."""

import pathlib
import runpy
import sys

import pytest

# cookbooks whose inference workload dominates the suite's wall time
# (>15s each on the 4-worker CPU mesh) — slow lane
SLOW = {
    "05_mcmc",
    "08_dp_mixture",
    "09_smcp3",
    "10_sample_posterior",
    "13_checkpoint_resume",
    "14_multichip",
    "16_chees",
    "17_involutive_rj",
    "18_amortized_vi",
    "19_discrete_workflow",
    "22_gp_workflow",
    "23_model_evaluation",
    "26_dense_mass",
}

EXAMPLES = sorted(
    (pathlib.Path(__file__).parents[1] / "examples").glob("*.py")
)


def _param(path):
    marks = [pytest.mark.slow] if path.stem in SLOW else []
    return pytest.param(path, id=path.stem, marks=marks)


def test_slow_set_matches_files():
    """Every SLOW entry names a real cookbook (catches renames)."""
    stems = {p.stem for p in EXAMPLES}
    assert SLOW <= stems, SLOW - stems


@pytest.mark.parametrize("path", [_param(p) for p in EXAMPLES])
def test_example_runs(path, capsys, monkeypatch):
    monkeypatch.setattr(sys, "argv", [str(path)])
    runpy.run_path(str(path), run_name="__main__")

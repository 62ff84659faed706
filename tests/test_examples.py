"""Every cookbook example runs in CI (VERDICT round-1 item 10): the
examples are the framework's documentation narratives — they assert their
own claims, so running them is the doctest layer (reference analog:
noxfile.py:136-148 xdoctest + docs/cookbook/active/*.ipynb)."""

import pathlib
import runpy
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parents[1] / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(path, capsys, monkeypatch):
    monkeypatch.setattr(sys, "argv", [str(path)])
    runpy.run_path(str(path), run_name="__main__")

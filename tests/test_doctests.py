"""Executed docstring examples across the whole package.

The reference runs xdoctest over all docstrings (reference
noxfile.py:136-148) so user-facing examples cannot go stale. xdoctest is
not in this image; stdlib ``doctest`` over every ``genjax_tpu`` module is
the same gate: each ``>>>`` example in a package docstring executes here,
and a volume floor keeps the example layer from silently shrinking.
"""

import doctest
import importlib
import pkgutil

import pytest

import genjax_tpu

FLAGS = doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE


def _modules():
    yield genjax_tpu
    for info in pkgutil.walk_packages(
        genjax_tpu.__path__, prefix="genjax_tpu."
    ):
        yield importlib.import_module(info.name)


MODULES = list(_modules())
_FINDER = doctest.DocTestFinder(exclude_empty=True)
WITH_EXAMPLES = [
    m
    for m in MODULES
    if any(t.examples for t in _FINDER.find(m))
]


@pytest.mark.parametrize("mod", WITH_EXAMPLES, ids=lambda m: m.__name__)
def test_docstring_examples(mod):
    failed, attempted = doctest.testmod(mod, optionflags=FLAGS).failed, None
    assert failed == 0, f"{mod.__name__}: {failed} docstring example(s) failed"


def test_example_volume():
    """The executed-example layer stays substantial: at least 40 examples
    across at least 12 modules."""
    per_mod = {
        m.__name__: sum(len(t.examples) for t in _FINDER.find(m))
        for m in WITH_EXAMPLES
    }
    total = sum(per_mod.values())
    assert len(per_mod) >= 12, sorted(per_mod)
    assert total >= 40, per_mod

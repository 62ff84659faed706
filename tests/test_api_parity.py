"""API-parity regression: every public name the reference exports must be
resolvable from the corresponding ``genjax_tpu`` namespace.

The fixture ``tests/fixtures_reference_api.json`` is the reference's
``__all__`` lists extracted (by AST, no import) from every facade module
under ``/root/reference/src/genjax/`` (non-``_src``): 166 distinct names
across 16 modules.  This test enforces the sweep on every CI run (VERDICT
round-1 item 8) instead of relying on a one-time commit claim.
"""

import json
import pathlib

import pytest

FIXTURE = pathlib.Path(__file__).parent / "fixtures_reference_api.json"

# Reference names that deliberately have no counterpart, with the reason.
# Keep this list SHORT and justified — anything here is a documented
# architecture deviation (see ARCHITECTURE.md), not a gap.
KNOWN_DEVIATIONS = {
    # The reference embeds addressed calls as a Jaxpr primitive
    # (static.py:156 ``trace_p``) and reinterprets; genjax_tpu executes
    # ``@gen`` bodies under a handler stack (core/handlers.py), so there is
    # no trace primitive object. The *intrinsic* ``trace`` is exported.
    ("generative_functions.static", "trace_p"),
}


def _namespaces():
    import importlib

    import genjax_tpu as g

    chk = importlib.import_module("genjax_tpu.checkify")
    prt = importlib.import_module("genjax_tpu.pretty")
    tt = importlib.import_module("genjax_tpu.time_travel")
    comb = importlib.import_module("genjax_tpu.combinators")
    dists = importlib.import_module("genjax_tpu.dists")
    reqs = importlib.import_module("genjax_tpu.inference.requests")
    vi = importlib.import_module("genjax_tpu.inference.vi")
    return {
        "adev": [g.adev],
        "checkify": [chk, g],
        "incremental": [g.incremental, g],
        "pretty": [g, prt],
        "time_travel": [tt, g.debug, g],
        "generative_functions.combinators": [g, comb],
        "generative_functions.static": [g],
        "generative_functions.distributions": [g, dists],
        "inference": [g.inference, g],
        "inference.requests": [reqs, g],
        "inference.smc": [g.inference, g],
        "inference.vi": [vi, g],
        "core.compiler": [g.core, g],
        "core.generative": [g, g.core, g.generative],
        "core.pytree": [g, g.core],
        "core.requests": [g, g.core],
    }


def _fixture():
    return json.loads(FIXTURE.read_text())


def test_fixture_is_complete():
    fix = _fixture()
    total = set()
    for names in fix.values():
        total.update(names)
    assert len(total) == 166, (
        "reference API fixture changed size — regenerate it from the "
        f"reference facade modules (got {len(total)})"
    )


@pytest.mark.parametrize("module", sorted(_fixture().keys()))
def test_reference_public_names_resolve(module):
    fix = _fixture()
    spaces = _namespaces()[module]
    missing = [
        name
        for name in fix[module]
        if (module, name) not in KNOWN_DEVIATIONS
        and not any(hasattr(ns, name) for ns in spaces)
    ]
    assert not missing, (
        f"reference module {module!r} exports {missing} but genjax_tpu "
        "does not — export them or add a justified KNOWN_DEVIATIONS entry"
    )

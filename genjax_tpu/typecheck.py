"""Runtime type validation for the GFI boundary.

The reference activates ``beartype`` for the whole package on import
(``/root/reference/src/genjax/__init__.py:26-33``) and gates CI on pyright
strict (reference pyproject ``[tool.pyright]``) — SURVEY.md §4 counts this
as one of its five testing layers. This image ships neither beartype nor
pyright (and installation is off-limits), so the layer is rebuilt from
what exists:

- **Always-on boundary validation** (this module): cheap ``isinstance``
  checks of the GFI's contract — keys are PRNG key arrays, constraints are
  ``ChoiceMap``s, arguments are tuples — raising immediately with a
  targeted message instead of a deep JAX tracer error. Cost is a few
  Python ``isinstance`` calls at trace time; nothing is staged.
- **Opt-in deep checking** (``install_import_hook``): jaxtyping +
  typeguard instrumentation of annotated signatures across the package,
  the direct analog of ``beartype_this_package`` for development runs.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


class GFITypeError(TypeError):
    """A GFI entry point was called with the wrong kind of value."""


def _is_prng_key(key: Any) -> bool:
    if isinstance(key, (jax.Array, np.ndarray)) or hasattr(key, "aval"):
        dtype = getattr(key, "dtype", None)
        if dtype is not None and jax.dtypes.issubdtype(
            dtype, jax.dtypes.prng_key
        ):
            return True
        # raw uint32 key pairs (legacy jax.random.PRNGKey format)
        shape = getattr(key, "shape", None)
        return (
            dtype == np.uint32
            and shape is not None
            and len(shape) >= 1
            and shape[-1] == 2
        )
    return False


def check_key(key: Any, what: str) -> None:
    if not _is_prng_key(key):
        raise GFITypeError(
            f"{what}: expected a JAX PRNG key as the first argument, got "
            f"{type(key).__name__}. Build one with jax.random.key(seed)."
        )


def check_args(args: Any, what: str) -> None:
    if not isinstance(args, tuple):
        raise GFITypeError(
            f"{what}: arguments must be passed as a tuple, got "
            f"{type(args).__name__}. For a single argument write (x,)."
        )


def check_constraint(constraint: Any, what: str) -> None:
    from .generative.choice_map import ChoiceMap

    if not isinstance(constraint, ChoiceMap):
        hint = ""
        if isinstance(constraint, dict):
            hint = " Build one with ChoiceMap.d({...}) or C[addr].set(v)."
        raise GFITypeError(
            f"{what}: the constraint must be a ChoiceMap, got "
            f"{type(constraint).__name__}.{hint}"
        )


def check_selection(selection: Any, what: str) -> None:
    from .generative.selection import Selection

    if not isinstance(selection, Selection):
        raise GFITypeError(
            f"{what}: expected a Selection (e.g. S['x'] or Selection.all()), "
            f"got {type(selection).__name__}."
        )


def install_import_hook(packages="genjax_tpu"):
    """Instrument ``packages`` with typeguard-checked signatures (the
    ``beartype_this_package`` analog) for development runs.

    With typeguard >= 3 (import hook API), call BEFORE importing the
    package and use as a context manager around the import. With the
    typeguard 2.x in this image, returns a ``TypeChecker`` context manager
    that warns on annotation violations while active:

        from genjax_tpu.typecheck import install_import_hook
        with install_import_hook():
            ...  # calls into genjax_tpu are checked

    ``packages`` narrows the scope (a module name or list of names) —
    whole-package checking is a sys.setprofile-based sweep under
    typeguard 2.x and costs real time on hot paths.
    """
    import typeguard

    if hasattr(typeguard, "install_import_hook"):
        return typeguard.install_import_hook(packages)
    return typeguard.TypeChecker(packages)

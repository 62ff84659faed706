"""Var→value environment for Jaxpr interpreters.

Parity: reference ``/root/reference/src/genjax/_src/core/compiler/interpreters/
environment.py`` (``Environment`` :24). Used by the ADEV CPS interpreter and
the time-travel debugger.
"""

from __future__ import annotations

from typing import Any

from jax.extend.core import Literal, Var


class Environment:
    """Keeps track of variables and their values during Jaxpr interpretation."""

    def __init__(self):
        self.env: dict[int, Any] = {}

    def read(self, var: Any) -> Any:
        if isinstance(var, Literal):
            return var.val
        return self.env[var.count]

    def write(self, var: Any, value: Any) -> Any:
        if isinstance(var, Literal):
            return value
        self.env[var.count] = value
        return value

    def __getitem__(self, var):
        return self.read(var)

    def __setitem__(self, var, value):
        self.write(var, value)

    def __contains__(self, var) -> bool:
        if isinstance(var, Literal):
            return True
        return var.count in self.env

    def copy(self) -> "Environment":
        new = Environment()
        new.env = self.env.copy()
        return new

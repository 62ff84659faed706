"""``GenerativeFunction``: the Generative Function Interface (GFI).

Parity: reference ``/root/reference/src/genjax/_src/core/generative/
generative_function.py`` — abstract ``simulate`` :379, ``assess`` :436,
``generate`` :478, ``project`` :487, ``edit`` :496-605 (SMCP3 semantics);
derived ``update`` :611, ``importance`` :629, ``propose`` :677;
``__abstract_call__`` :295, ``get_zero_trace`` :341, ``handle_kwargs`` :303;
postfix combinator methods :700-1484; ``GenerativeFunctionClosure`` :1558
(``@``-binding :1568-1583, partial GFI forwarding :1611-1684).
"""

from __future__ import annotations

import abc
import functools
from typing import Any, Callable


from ..core.diff import Diff
from ..core.handlers import dispatch_trace
from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from .choice_map import ChoiceMap
from .concepts import (
    Arguments,
    EditRequest,
    Retdiff,
    Score,
    Update,
    Weight,
)
from .selection import Selection
from .trace import Trace


class GenerativeFunction(Pytree):
    """A computational object representing a probability measure over an
    addressed sample space, supporting the GFI: ``simulate``, ``assess``,
    ``generate``, ``project``, ``edit`` (+ derived ``update``, ``importance``,
    ``propose``)."""

    # ------------------------------------------------------------------
    # abstract GFI
    # ------------------------------------------------------------------

    @abc.abstractmethod
    def simulate(self, key: PRNGKey, args: Arguments) -> Trace:
        """Sample ``choices ~ P(.; args)`` and return an execution trace."""

    @abc.abstractmethod
    def assess(self, chm: ChoiceMap, args: Arguments) -> tuple[Score, Any]:
        """Full-constraint density evaluation: ``(log P(chm; args), retval)``."""

    @abc.abstractmethod
    def generate(
        self, key: PRNGKey, constraint: ChoiceMap, args: Arguments
    ) -> tuple[Trace, Weight]:
        """Importance sampling under partial constraints. Returns a trace whose
        choices agree with ``constraint`` and a weight estimating
        ``log [P(choices; args) / Q(unconstrained; constraint, args)]``."""

    @abc.abstractmethod
    def project(self, key: PRNGKey, trace: Trace, selection: Selection) -> Weight:
        """The log-density contribution of the selected choices."""

    @abc.abstractmethod
    def edit(
        self,
        key: PRNGKey,
        trace: Trace,
        request: EditRequest,
        argdiffs: Any,
    ) -> tuple[Trace, Weight, Retdiff, EditRequest]:
        """Serve a primitive edit request with SMCP3 weight accounting."""

    # ------------------------------------------------------------------
    # derived GFI (generative_function.py:611-698)
    # ------------------------------------------------------------------

    def update(
        self, key: PRNGKey, trace: Trace, constraint: ChoiceMap, argdiffs: Any = None
    ):
        if argdiffs is None:
            argdiffs = Diff.tree_diff_no_change(trace.get_args())
        new_tr, w, retdiff, bwd = self.edit(
            key, trace, Update(constraint), argdiffs
        )
        discard = bwd.constraint if isinstance(bwd, Update) else bwd
        return new_tr, w, retdiff, discard

    def importance(
        self, key: PRNGKey, constraint: ChoiceMap, args: Arguments
    ) -> tuple[Trace, Weight]:
        return self.generate(key, constraint, args)

    def propose(self, key: PRNGKey, args: Arguments):
        tr = self.simulate(key, args)
        return tr.get_choices(), tr.get_score(), tr.get_retval()

    def get_zero_trace(self, *args) -> Trace:
        from ..core.staging import empty_trace

        return empty_trace(self, args)

    def __abstract_call__(self, *args) -> Any:
        """Return-value shape semantics; runs under ``eval_shape`` only."""
        import jax

        key = jax.random.key(0)
        return self.simulate(key, args).get_retval()

    # ------------------------------------------------------------------
    # call/closure syntax
    # ------------------------------------------------------------------

    def __call__(self, *args, **kwargs) -> "GenerativeFunctionClosure":
        return GenerativeFunctionClosure(self, args, tuple(kwargs.items()))

    def __matmul__(self, addr):
        """Support zero-argument models: ``model @ "x"``."""
        return GenerativeFunctionClosure(self, (), ()) @ addr

    def handle_kwargs(self) -> "GenerativeFunction":
        """A gen fn equivalent to this one taking ``(args, kwargs_dict)``."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support keyword arguments."
        )

    # ------------------------------------------------------------------
    # postfix combinators (generative_function.py:700-1484)
    # ------------------------------------------------------------------

    def vmap(self, /, *, in_axes: Any = 0, axis_size: int | None = None, axis_name: str | None = None):
        from ..combinators.vmap import VmapCombinator

        return VmapCombinator(self, in_axes=in_axes, axis_size=axis_size, axis_name=axis_name)

    def repeat(self, /, *, n: int):
        from ..combinators.repeat import repeat

        return repeat(n=n)(self)

    def scan(self, /, *, n: int | None = None):
        from ..combinators.scan import ScanCombinator

        return ScanCombinator(self, length=n)

    def accumulate(self):
        from ..combinators.scan import accumulate

        return accumulate()(self)

    def reduce(self):
        from ..combinators.scan import reduce

        return reduce()(self)

    def iterate(self, /, *, n: int):
        from ..combinators.scan import iterate

        return iterate(n=n)(self)

    def iterate_final(self, /, *, n: int):
        from ..combinators.scan import iterate_final

        return iterate_final(n=n)(self)

    def masked_iterate(self):
        from ..combinators.scan import masked_iterate

        return masked_iterate()(self)

    def masked_iterate_final(self):
        from ..combinators.scan import masked_iterate_final

        return masked_iterate_final()(self)

    def mask(self):
        from ..combinators.mask_comb import MaskCombinator

        return MaskCombinator(self)

    def or_else(self, gen_fn: "GenerativeFunction"):
        from ..combinators.or_else import or_else

        return or_else(self, gen_fn)

    def switch(self, *branches: "GenerativeFunction"):
        from ..combinators.switch import SwitchCombinator

        return SwitchCombinator((self, *branches))

    def mix(self, *fns: "GenerativeFunction"):
        from ..combinators.mixture import mix

        return mix(self, *fns)

    def dimap(
        self,
        /,
        *,
        pre: Callable = lambda *args: args,
        post: Callable = lambda args, retval: retval,
        info: str | None = None,
    ):
        from ..combinators.dimap import DimapCombinator

        return DimapCombinator(self, pre, post, info)

    def map(self, f: Callable, *, info: str | None = None):
        return self.dimap(post=lambda _args, retval: f(retval), info=info)

    def contramap(self, f: Callable, *, info: str | None = None):
        return self.dimap(pre=f, info=info)

    def marginal(
        self,
        /,
        *,
        selection: Any = None,
        algorithm: Any = None,
    ):
        from ..inference.sp import Marginal

        if selection is None:
            selection = Selection.all()
        return Marginal(self, Pytree.const(selection), Pytree.const(algorithm))

    # ------------------------------------------------------------------
    # method binding (models as methods; generative_function.py:757)
    # ------------------------------------------------------------------

    def __get__(self, instance, _owner):
        if instance is None:
            return self
        return functools.partial(self.__call__, instance)


@Pytree.dataclass
class GenerativeFunctionClosure(Pytree):
    """Returned by ``gen_fn(*args)``: binds the call into an enclosing ``@gen``
    trace via ``@ "addr"``, and forwards the whole GFI with partially-applied
    args (generative_function.py:1558-1684)."""

    gen_fn: GenerativeFunction
    args: tuple
    kwargs: tuple  # tuple of (name, value) pairs; values may be traced

    def _resolved(self) -> tuple[GenerativeFunction, tuple]:
        if self.kwargs:
            kw = dict(self.kwargs)
            return self.gen_fn.handle_kwargs(), (self.args, kw)
        return self.gen_fn, self.args

    def __matmul__(self, addr):
        gen_fn, args = self._resolved()
        return dispatch_trace(addr, gen_fn, args)

    # ----- full GFI forwarding with partially-applied args -----

    def simulate(self, key: PRNGKey) -> Trace:
        gen_fn, args = self._resolved()
        return gen_fn.simulate(key, args)

    def assess(self, chm: ChoiceMap) -> tuple[Score, Any]:
        gen_fn, args = self._resolved()
        return gen_fn.assess(chm, args)

    def generate(self, key: PRNGKey, constraint: ChoiceMap):
        gen_fn, args = self._resolved()
        return gen_fn.generate(key, constraint, args)

    def importance(self, key: PRNGKey, constraint: ChoiceMap):
        gen_fn, args = self._resolved()
        return gen_fn.importance(key, constraint, args)

    def propose(self, key: PRNGKey):
        gen_fn, args = self._resolved()
        return gen_fn.propose(key, args)

    def __call__(self, key: PRNGKey):
        gen_fn, args = self._resolved()
        return gen_fn.simulate(key, args).get_retval()

    def __abstract_call__(self):
        gen_fn, args = self._resolved()
        return gen_fn.__abstract_call__(*args)

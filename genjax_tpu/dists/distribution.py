"""``Distribution``: generative functions over a single (unaddressed) choice.

Parity: reference ``/root/reference/src/genjax/_src/generative_functions/
distributions/distribution.py`` (500 LoC) — ``Distribution`` with the
stochastic-probability interface ``random_weighted``/``estimate_logpdf``
:90-106, ``DistributionTrace`` :60, ``generate`` on full/masked/absent
constraint :117-147, ``edit`` for ``Update`` (incl. masked constraints)
:179-244 and ``Regenerate`` :258-300, ``project`` :246, ``ExactDensity`` :359,
``exact_density`` factory :436.

Improvement over the reference: ``Regenerate`` with a *traced* selection flag
is supported via a staged ``cond`` (the reference raises NotImplementedError).
"""

from __future__ import annotations

import abc
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.diff import Diff
from ..core.staging import FlagOp
from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from ..generative.choice_map import ChoiceMap, ValueChm
from ..generative.concepts import (
    EditRequest,
    NotSupportedEditRequest,
    Regenerate,
    Retdiff,
    Score,
    Update,
    Weight,
)
from ..generative.gfi import GenerativeFunction
from ..generative.mask import Mask
from ..generative.selection import Selection
from ..generative.trace import Trace


@Pytree.dataclass
class DistributionTrace(Trace):
    gen_fn: "Distribution"
    args: tuple
    value: Any
    score: Score

    def get_args(self) -> tuple:
        return self.args

    def get_retval(self) -> Any:
        return self.value

    def get_score(self) -> Score:
        return self.score

    def get_gen_fn(self) -> "Distribution":
        return self.gen_fn

    def get_choices(self) -> ChoiceMap:
        return ValueChm(self.value)


class Distribution(GenerativeFunction):
    """Measure over a single choice, with (possibly estimated) densities.

    Distributions are generative functions: use them standalone or at an
    address inside ``@gen``:

    >>> import jax
    >>> import jax.numpy as jnp
    >>> import genjax_tpu as g
    >>> round(float(g.normal.logpdf(0.0, 0.0, 1.0)), 5)  # N(0,1) at 0
    -0.91894
    >>> tr = g.normal.simulate(jax.random.key(0), (0.0, 1.0))
    >>> bool(jnp.isclose(
    ...     tr.get_score(), g.normal.logpdf(tr.get_retval(), 0.0, 1.0)
    ... ))
    True
    """

    @abc.abstractmethod
    def random_weighted(self, key: PRNGKey, *args) -> tuple[Score, Any]:
        """Sample ``v`` and return ``(log density-estimate at v, v)``."""

    @abc.abstractmethod
    def estimate_logpdf(self, key: PRNGKey, v: Any, *args) -> Score:
        ...

    # ------------------------------------------------------------------
    # GFI
    # ------------------------------------------------------------------

    def simulate(self, key: PRNGKey, args: tuple) -> DistributionTrace:
        score, v = self.random_weighted(key, *args)
        return DistributionTrace(self, args, v, score)

    def assess(self, chm: ChoiceMap, args: tuple):
        raise NotImplementedError(
            "assess requires an exact density; use ExactDensity or an "
            "inference Algorithm."
        )

    def generate(
        self, key: PRNGKey, constraint: ChoiceMap, args: tuple
    ) -> tuple[DistributionTrace, Weight]:
        v = constraint.get_value()
        if v is None:
            from ..checkify import constraint_validation_active

            if (
                constraint_validation_active()
                and not constraint.static_is_empty()
            ):
                from ..core.handlers import active_handler
                from ..generative.choice_map import (
                    ChoiceMapInvalidAddress,
                    exists_flag,
                )

                if active_handler() is None and FlagOp.concrete_true(
                    exists_flag(constraint)
                ):
                    raise ChoiceMapInvalidAddress(
                        "generate: a distribution takes a value constraint "
                        f"at the root, got sub-addressed entries: {constraint}"
                    )
            tr = self.simulate(key, args)
            return tr, jnp.asarray(0.0)
        if isinstance(v, Mask):
            # the two cond branches must agree on the value dtype even when
            # the constraint's dtype differs from the sampler's (e.g. an
            # int 0/1 observation array constraining a boolean flip)
            sample_aval = jax.eval_shape(
                lambda k: self.random_weighted(k, *args)[1], key
            )
            out_dtype = jnp.promote_types(
                sample_aval.dtype, jnp.result_type(v.value)
            )

            def _importance(key, value):
                w = self.estimate_logpdf(key, value, *args)
                return (w, w, jnp.asarray(value, out_dtype))

            def _simulate(key, value):
                score, fresh = self.random_weighted(key, *args)
                return (score, jnp.asarray(0.0), jnp.asarray(fresh, out_dtype))

            score, w, value = FlagOp.cond(
                v.primal_flag(), _importance, _simulate, key, v.value
            )
            return DistributionTrace(self, args, value, score), w
        w = self.estimate_logpdf(key, v, *args)
        return DistributionTrace(self, args, v, w), w

    def project(self, key: PRNGKey, trace: Trace, selection: Selection) -> Weight:
        check = selection.check()
        if FlagOp.concrete_true(check):
            return trace.get_score()
        if FlagOp.concrete_false(check):
            return jnp.asarray(0.0)
        return jnp.where(check, trace.get_score(), 0.0)

    # ------------------------------------------------------------------
    # edits
    # ------------------------------------------------------------------

    def edit(
        self,
        key: PRNGKey,
        trace: Trace,
        request: EditRequest,
        argdiffs: Any,
    ) -> tuple[Trace, Weight, Retdiff, EditRequest]:
        if isinstance(request, Update):
            return self._edit_update(key, trace, request.constraint, argdiffs)
        if isinstance(request, Regenerate):
            return self._edit_regenerate(key, trace, request.selection, argdiffs)
        raise NotSupportedEditRequest(
            f"{type(self).__name__} cannot serve {type(request).__name__}."
        )

    def _edit_update(self, key, trace, constraint: ChoiceMap, argdiffs):
        primals = Diff.tree_primal(argdiffs)
        v = constraint.get_value()
        old_choices = trace.get_choices()
        if v is None:
            old_v = old_choices.get_value()
            fwd = self.estimate_logpdf(key, old_v, *primals)
            w = fwd - trace.get_score()
            new_tr = DistributionTrace(self, primals, old_v, fwd)
            return new_tr, w, Diff.no_change(old_v), Update(ChoiceMap.empty())
        if isinstance(v, Mask):
            flag = v.primal_flag()
            old_v = old_choices.get_value()

            def _constrained(key, new_value, _old):
                fwd = self.estimate_logpdf(key, new_value, *primals)
                return (new_value, fwd - trace.get_score(), fwd)

            def _unconstrained(key, _new, old_value):
                fwd = self.estimate_logpdf(key, old_value, *primals)
                return (old_value, fwd - trace.get_score(), fwd)

            new_v, w, score = FlagOp.cond(
                flag, _constrained, _unconstrained, key, v.value, old_v
            )
            return (
                DistributionTrace(self, primals, new_v, score),
                w,
                Diff.unknown_change(new_v),
                Update(old_choices.mask(flag)),
            )
        fwd = self.estimate_logpdf(key, v, *primals)
        w = fwd - trace.get_score()
        new_tr = DistributionTrace(self, primals, v, fwd)
        return new_tr, w, Diff.unknown_change(v), Update(old_choices)

    def _edit_regenerate(self, key, trace, selection: Selection, argdiffs):
        check = selection.check()
        primals = Diff.tree_primal(argdiffs)
        if FlagOp.concrete_true(check):
            score, new_v = self.random_weighted(key, *primals)
            w = score - trace.get_score()
            new_tr = DistributionTrace(self, primals, new_v, score)
            return (
                new_tr,
                w,
                Diff.unknown_change(new_v),
                Update(ChoiceMap.choice(trace.get_retval())),
            )
        if FlagOp.concrete_false(check):
            if Diff.static_check_no_change(argdiffs):
                return (
                    trace,
                    jnp.asarray(0.0),
                    Diff.no_change(trace.get_retval()),
                    Update(ChoiceMap.empty()),
                )
            old_v = trace.get_choices().get_value()
            new_score = self.estimate_logpdf(key, old_v, *primals)
            new_tr = DistributionTrace(self, primals, old_v, new_score)
            return (
                new_tr,
                new_score - trace.get_score(),
                Diff.no_change(trace.get_retval()),
                Update(ChoiceMap.empty()),
            )
        # Traced selection flag: staged cond over regenerate-vs-keep.
        old_v = trace.get_choices().get_value()

        def _regen(key):
            score, new_v = self.random_weighted(key, *primals)
            return new_v, score

        def _keep(key):
            score = self.estimate_logpdf(key, old_v, *primals)
            return old_v, score

        new_v, score = jax.lax.cond(check, _regen, _keep, key)
        w = score - trace.get_score()
        new_tr = DistributionTrace(self, primals, new_v, score)
        return (
            new_tr,
            w,
            Diff.unknown_change(new_v),
            Update(ChoiceMap.choice(old_v).mask(check)),
        )

    def handle_kwargs(self) -> GenerativeFunction:
        return KwargsDistribution(self)


class ExactDensity(Distribution):
    """A distribution with exactly-computable density: supplies ``sample`` and
    ``logpdf``; the stochastic-probability interface follows (reference
    distribution.py:359-434)."""

    @abc.abstractmethod
    def sample(self, key: PRNGKey, *args) -> Any:
        ...

    @abc.abstractmethod
    def logpdf(self, v: Any, *args) -> Score:
        ...

    def random_weighted(self, key: PRNGKey, *args) -> tuple[Score, Any]:
        v = self.sample(key, *args)
        return self.logpdf(v, *args), v

    def estimate_logpdf(self, key: PRNGKey, v: Any, *args) -> Score:
        return self.logpdf(v, *args)

    def assess(self, chm: ChoiceMap, args: tuple):
        v = chm.get_value()
        if isinstance(v, Mask):
            from ..checkify import optional_check

            def check():
                import jax.experimental.checkify as cf

                cf.check(
                    jnp.all(jnp.asarray(v.primal_flag())),
                    "assess: masked constraint with invalid flag",
                )

            optional_check(check)
            v = v.value
        score = self.logpdf(v, *args)
        return score, v


@Pytree.dataclass
class KwargsDistribution(Distribution):
    """Kwargs adaptor: args become ``(positional_args, kwargs_dict)``."""

    inner: Distribution

    def random_weighted(self, key, *args):
        (pos, kw) = args
        if isinstance(self.inner, ExactDensity):
            v = self.inner.sample(key, *pos, **kw)
            return self.inner.logpdf(v, *pos, **kw), v
        raise NotImplementedError("kwargs on non-exact distributions")

    def estimate_logpdf(self, key, v, *args):
        (pos, kw) = args
        if isinstance(self.inner, ExactDensity):
            return self.inner.logpdf(v, *pos, **kw)
        raise NotImplementedError("kwargs on non-exact distributions")

    def assess(self, chm, args):
        (pos, kw) = args
        v = chm.get_value()
        if isinstance(v, Mask):
            v = v.value
        score = self.inner.logpdf(v, *pos, **kw)
        return score, v


@Pytree.dataclass
class LambdaDensity(ExactDensity):
    """An ExactDensity from a sampler/logpdf function pair."""

    sampler: Callable = Pytree.static()
    logpdf_fn: Callable = Pytree.static()
    name: str = Pytree.static(default="exact_density")

    def sample(self, key: PRNGKey, *args, **kwargs) -> Any:
        return self.sampler(key, *args, **kwargs)

    def logpdf(self, v: Any, *args, **kwargs) -> Score:
        return self.logpdf_fn(v, *args, **kwargs)

    def __repr__(self):
        return f"genjax_tpu.{self.name}"


def tfp_distribution(dist_ctor, name: str = "tfp_distribution") -> "LambdaDensity":
    """Compatibility shim for the reference's TFP wrapper
    (tensorflow_probability/__init__.py:35-64): wraps any constructor whose
    instances expose ``sample(seed=key)`` and ``log_prob(v)`` (the
    TFP-on-JAX protocol — duck-typed, so tensorflow_probability itself is
    not required) as an ``ExactDensity``."""

    def sampler(key, *args, **kwargs):
        return dist_ctor(*args, **kwargs).sample(seed=key)

    def logpdf(v, *args, **kwargs):
        import jax.numpy as _jnp

        lp = dist_ctor(*args, **kwargs).log_prob(v)
        return _jnp.sum(lp) if _jnp.shape(lp) else lp

    return LambdaDensity(sampler, logpdf, name)


def exact_density(
    sample: Callable, logpdf: Callable, name: str = "exact_density"
) -> LambdaDensity:
    """Build an ``ExactDensity`` from a ``sample(key, *args)`` function and a
    ``logpdf(v, *args)`` function (reference distribution.py:436)."""
    return LambdaDensity(sample, logpdf, name)

"""GenSP core: posterior targets, stochastic-probability algorithms, and
marginal distributions.

Parity: reference ``/root/reference/src/genjax/_src/inference/sp.py`` —
``Target`` :53 (``importance`` :83, ``filter_to_unconstrained`` :89),
``SampleDistribution`` :101, ``Algorithm`` :111 (``random_weighted`` :143,
``estimate_logpdf`` :164, VI hooks :184-192), ``Marginal`` :208, ``marginal``
decorator :260.

Mathematical contracts (Lew et al. 2023, "Probabilistic programming with
stochastic probabilities"): ``Algorithm.random_weighted(key, target)``
returns ``(w, S)`` with ``E[1/w | S] = 1 / P(S | constraint; args)``;
``estimate_logpdf(key, S, target)`` returns ``w`` with
``E[w] = P(S | constraint; args)``.
"""

from __future__ import annotations

import abc
from typing import Any, Callable

import jax

from ..core.pytree import Pytree
from ..core.typing_ import PRNGKey
from ..dists.distribution import Distribution
from ..generative.choice_map import ChoiceMap
from ..generative.concepts import Score, Weight
from ..generative.gfi import GenerativeFunction
from ..generative.selection import Selection
from ..generative.trace import Trace


@Pytree.dataclass
class Target(Pytree):
    """An unnormalized target posterior: a generative function ``p``
    conditioned on ``constraint`` at arguments ``args``
    (reference sp.py:53)."""

    p: GenerativeFunction
    args: tuple
    constraint: ChoiceMap

    def importance(self, key: PRNGKey, constraint: ChoiceMap) -> tuple[Trace, Weight]:
        merged = self.constraint.merge(constraint)
        return self.p.importance(key, merged, self.args)

    def filter_to_unconstrained(self, choice_map: ChoiceMap) -> ChoiceMap:
        selection = ~self.constraint.get_selection()
        return choice_map.filter(selection)

    def __getitem__(self, addr):
        return self.constraint[addr]


class SampleDistribution(Distribution):
    """A distribution whose return value is a ``ChoiceMap``
    (reference sp.py:101)."""


class Algorithm(SampleDistribution):
    """An inference algorithm: a distribution over choice maps approximating
    a ``Target``'s posterior, with unbiased density estimates
    (reference sp.py:111)."""

    @abc.abstractmethod
    def random_weighted(self, key: PRNGKey, *args) -> tuple[Score, ChoiceMap]:
        ...

    @abc.abstractmethod
    def estimate_logpdf(self, key: PRNGKey, v: ChoiceMap, *args) -> Score:
        ...

    # ----- VI hooks (sp.py:184-192) -----

    @abc.abstractmethod
    def estimate_normalizing_constant(self, key: PRNGKey, target: Target) -> Weight:
        ...

    @abc.abstractmethod
    def estimate_reciprocal_normalizing_constant(
        self,
        key: PRNGKey,
        target: Target,
        latent_choices: ChoiceMap,
        w: Weight,
    ) -> Weight:
        ...


@Pytree.dataclass
class Marginal(SampleDistribution):
    """The marginal distribution of a generative function over a selection of
    addresses; density estimates via nested inference (reference sp.py:208).

    ``selection``/``algorithm`` ride in ``Const`` wrappers so a ``Marginal``
    can cross jit boundaries in the treedef.
    """

    gen_fn: GenerativeFunction
    selection: Any  # Const[Selection]
    algorithm: Any = None  # Const[Algorithm | None]

    def _selection(self) -> Selection:
        from ..core.pytree import const_unwrap

        return const_unwrap(self.selection)

    def _algorithm(self):
        from ..core.pytree import const_unwrap

        return const_unwrap(self.algorithm)

    def random_weighted(self, key: PRNGKey, *args) -> tuple[Score, ChoiceMap]:
        key, sim_key, proj_key = jax.random.split(key, 3)
        selection = self._selection()
        tr = self.gen_fn.simulate(sim_key, args)
        choices = tr.get_choices()
        latent_choices = choices.filter(selection)
        # Unbiased density-sampler weight (Lew 2023, Defn 3.2): the density
        # estimate of the latent sample is the full score minus the internal
        # proposal density of the marginalized-out choices. (The reference,
        # sp.py:233, returns only `project(~selection)` — zero when the
        # selection is `All` — which drops the guide-entropy term from every
        # ELBO gradient; corrected here.)
        weight = tr.get_score() - tr.project(proj_key, ~selection)
        algorithm = self._algorithm()
        if algorithm is None:
            return weight, latent_choices
        target = Target(self.gen_fn, args, latent_choices)
        other_choices = choices.filter(~selection)
        Z = algorithm.estimate_reciprocal_normalizing_constant(
            key, target, other_choices, weight
        )
        return Z, latent_choices

    def estimate_logpdf(self, key: PRNGKey, v: ChoiceMap, *args) -> Score:
        algorithm = self._algorithm()
        if algorithm is None:
            _, weight = self.gen_fn.importance(key, v, args)
            return weight
        target = Target(self.gen_fn, args, v)
        return algorithm.estimate_normalizing_constant(key, target)


def marginal(
    selection: Selection | None = None,
    algorithm: Algorithm | None = None,
) -> Callable[[GenerativeFunction], Marginal]:
    """Decorator: ``marginal(selection)(gen_fn)`` (reference sp.py:260)."""
    if selection is None:
        selection = Selection.all()

    def decorator(gen_fn: GenerativeFunction) -> Marginal:
        return Marginal(gen_fn, Pytree.const(selection), Pytree.const(algorithm))

    return decorator

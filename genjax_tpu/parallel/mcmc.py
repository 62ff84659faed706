"""Sharded MCMC: chain batches over a device mesh with cross-chain
step-size adaptation.

No reference counterpart. Chains are embarrassingly parallel — the chain
axis shards with one ``NamedSharding`` and XLA partitions the vmapped
``lax.scan`` program; cross-chain statistics (mean accept rate for dual
averaging) compile to ICI ``psum`` automatically because they are reductions
over the sharded axis.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from typing import TYPE_CHECKING

from ..core.typing_ import PRNGKey
from ..generative.concepts import EditRequest
from ..generative.selection import Selection

if TYPE_CHECKING:
    # Annotation-only: parallel/ sits BELOW inference/ in the layer order
    # (tests/test_layering.py); the runtime import of run_chain is lazy.
    from ..inference.mcmc import MHChainResult


def run_chains_sharded(
    key: PRNGKey,
    make_trace: Callable[[PRNGKey], Any],
    request: EditRequest | Selection,
    n_steps: int,
    n_chains: int,
    mesh: Mesh,
    *,
    axis: str = "batch",
    record: Callable[[Any], Any] | None = None,
) -> MHChainResult:
    """``inference.mcmc.run_chains`` with the chain axis sharded over
    ``mesh`` — same program, multi-chip execution."""
    import jax.tree_util as jtu

    from ..inference.mcmc import run_chain

    keys = jr.split(key, n_chains)
    keys = jax.device_put(keys, NamedSharding(mesh, P(axis)))
    return _run_chains_jit(keys, request, make_trace, n_steps, record)


@functools.partial(
    jax.jit, static_argnames=("make_trace", "n_steps", "record")
)
def _run_chains_jit(keys, request, make_trace, n_steps, record):
    # module-level jit (NOT a per-call closure): repeat calls with the
    # same callables and shapes hit the compile cache instead of paying
    # the 10–400 s remote re-compile per invocation (CLAUDE.md)
    import jax.tree_util as jtu

    from ..inference.mcmc import run_chain

    def one(k):
        k_init, k_run = jr.split(k)
        tr = make_trace(k_init)
        return run_chain(k_run, tr, request, n_steps, record=record)

    # chains-on-lanes internal layout (see inference.mcmc.run_chains:
    # 20x on small models), restored to chains-leading on the outputs
    res = jax.vmap(one, out_axes=-1)(keys)
    return jtu.tree_map(lambda v: jnp.moveaxis(v, -1, 0), res)


# Step-size adaptation lives in the unified adaptation module
# (kernels/adaptation.py), shared with the column kernels; re-exported
# here for backwards compatibility.
from ..kernels.adaptation import (  # noqa: E402
    StepSizeAdaptState,
    dual_averaging_update,
)


def warmup_adapt_step_size(
    key: PRNGKey,
    traces: Any,
    make_request: Callable[[Any], EditRequest],
    n_warmup: int,
    *,
    eps0: float = 0.1,
    target_accept: float = 0.8,
) -> tuple[Any, Any]:
    """Adapt a global HMC step size over a *batch* of chains by dual
    averaging on the cross-chain mean accept probability.

    ``traces`` is a vmapped/sharded batch of chain states;
    ``make_request(eps)`` builds the HMC request at a step size. Under a
    sharded chain axis the ``jnp.mean`` over chains compiles to an ICI
    ``psum``. Returns ``(adapted_traces, eps)``.
    """

    def warm_step(carry, kk):
        traces, adapt = carry
        eps = jnp.exp(adapt.log_eps)

        def one(k, tr):
            # Independent edit/accept keys: fold_in(k, 1) == split(k)[1] is
            # the sub-key HMC.edit uses for momenta, so the accept uniform
            # must come from a separate split (advisor round-1 finding).
            k_edit, k_acc = jr.split(k)
            new_tr, alpha, _, _ = tr.edit(k_edit, make_request(eps))
            # a diverged leapfrog yields alpha = NaN; count it as a
            # rejection (prob 0) or one poisoned chain makes mean_accept
            # — and then the dual-averaged eps — NaN for the rest of
            # warmup (the column kernels guard this in-kernel)
            accept_prob = jnp.where(
                jnp.isnan(alpha), 0.0, jnp.minimum(1.0, jnp.exp(alpha))
            )
            log_u = jnp.log(jr.uniform(k_acc))
            accept = log_u < alpha
            out = jax.tree_util.tree_map(
                lambda new, old: jnp.where(accept, new, old), new_tr, tr
            )
            return out, accept_prob

        traces, accept_probs = jax.vmap(one)(
            jr.split(kk, _leading_size(traces)), traces
        )
        mean_accept = jnp.mean(accept_probs)  # psum over sharded chain axis
        adapt = dual_averaging_update(
            adapt, mean_accept, target_accept=target_accept
        )
        return (traces, adapt), mean_accept

    adapt0 = StepSizeAdaptState.init(eps0)
    (traces, adapt), accept_hist = lax.scan(
        warm_step, (traces, adapt0), jr.split(key, n_warmup)
    )
    return traces, jnp.exp(adapt.log_eps_bar)


def _leading_size(tree) -> int:
    import jax.tree_util as jtu

    for leaf in jtu.tree_leaves(tree):
        return leaf.shape[0]
    raise ValueError("empty tree")

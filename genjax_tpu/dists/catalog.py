"""The distribution catalog: 46 exact-density generative functions.

Parity: reference ``/root/reference/src/genjax/_src/generative_functions/
distributions/tensorflow_probability/__init__.py`` :72-317 — the reference
wraps TensorFlow Probability; this catalog implements every sampler and
log-density directly on ``jax.random`` / ``jax.scipy`` + the special-function
kernels in ``special.py``, with the *same names and TFP parameter orders* so
models port verbatim. Parameterization follows each TFP distribution's
constructor signature (e.g. ``bernoulli(logits)``, ``flip(probs)``,
``normal(loc, scale)``, ``gamma(concentration, rate)``).

All log-densities are elementwise over batch dimensions (TFP batch-shape
semantics); event-dimension distributions (dirichlet, multinomial,
mv_normal*, power_spherical, von_mises_fisher) reduce over the event axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr
import jax.scipy.stats as jss
from jax.scipy.special import (
    betaln,
    erf,
    gammaln,
    logsumexp,
    ndtr,
    xlog1py,
    xlogy,
    zeta,
)

from .distribution import exact_density
from . import special

__all__: list[str] = []


def _register(name, sampler, logpdf):
    d = exact_density(sampler, logpdf, name)
    globals()[name] = d
    __all__.append(name)
    return d


def _shape(kwargs):
    s = kwargs.pop("sample_shape", ())
    from ..core.pytree import Const

    return s.val if isinstance(s, Const) else s


def _bshape(sample_shape, *params):
    """TFP sample-shape semantics: the requested ``sample_shape`` PREPENDS
    the broadcast parameter batch shape (it is a count of iid draws, not
    another broadcast operand — broadcasting made batched-parameter calls
    crash, and silently collapsed N requested draws to one when the sizes
    coincided). Each ``param`` may be an array-like (its ``jnp.shape`` is
    used) or an explicit shape tuple."""
    shapes = [p if isinstance(p, tuple) else jnp.shape(p) for p in params]
    batch = jnp.broadcast_shapes(*shapes) if shapes else ()
    return tuple(sample_shape) + tuple(batch)


def _iid(sampler):
    """Lift a single-draw sampler to honor ``sample_shape`` by vmapping
    over split keys — for samplers (directional families) with no native
    batch-shape parameter; silently dropping the kwarg would hand callers
    one draw where they asked for many."""

    def f(key, *args, **kw):
        s = tuple(_shape(kw))
        if not s:
            return sampler(key, *args)
        import numpy as np

        n = int(np.prod(s))
        keys = jr.split(key, n)
        out = jax.vmap(lambda k: sampler(k, *args))(keys)
        return jnp.reshape(out, s + out.shape[1:])

    return f


# ----------------------------------------------------------------------
# continuous scalar families
# ----------------------------------------------------------------------

normal = _register(
    "normal",
    lambda key, loc=0.0, scale=1.0, **kw: loc
    + scale * jr.normal(key, _bshape(_shape(kw), loc, scale)),
    lambda v, loc=0.0, scale=1.0, **kw: jss.norm.logpdf(v, loc, scale),
)

cauchy = _register(
    "cauchy",
    lambda key, loc=0.0, scale=1.0, **kw: loc
    + scale * jr.cauchy(key, _bshape(_shape(kw), loc, scale)),
    lambda v, loc=0.0, scale=1.0, **kw: jss.cauchy.logpdf(v, loc, scale),
)

laplace = _register(
    "laplace",
    lambda key, loc=0.0, scale=1.0, **kw: loc
    + scale * jr.laplace(key, _bshape(_shape(kw), loc, scale)),
    lambda v, loc=0.0, scale=1.0, **kw: jss.laplace.logpdf(v, loc, scale),
)

logistic = _register(
    "logistic",
    lambda key, loc=0.0, scale=1.0, **kw: loc
    + scale * jr.logistic(key, _bshape(_shape(kw), loc, scale)),
    lambda v, loc=0.0, scale=1.0, **kw: jss.logistic.logpdf((v - loc) / scale)
    - jnp.log(scale),
)


def _gumbel_logpdf(v, loc=0.0, scale=1.0, **kw):
    z = (v - loc) / scale
    return -(z + jnp.exp(-z)) - jnp.log(scale)


gumbel = _register(
    "gumbel",
    lambda key, loc=0.0, scale=1.0, **kw: loc
    + scale * jr.gumbel(key, _bshape(_shape(kw), loc, scale)),
    _gumbel_logpdf,
)

student_t = _register(
    "student_t",
    lambda key, df, loc=0.0, scale=1.0, **kw: loc
    + scale * jr.t(key, df, _bshape(_shape(kw), df, loc, scale)),
    lambda v, df, loc=0.0, scale=1.0, **kw: jss.t.logpdf(v, df, loc, scale),
)


def _half(base_logpdf):
    def logpdf(v, *args, **kw):
        lp = jnp.log(2.0) + base_logpdf(v, *args, **kw)
        return jnp.where(v >= 0.0, lp, -jnp.inf)

    return logpdf


half_normal = _register(
    "half_normal",
    lambda key, scale=1.0, **kw: scale
    * jnp.abs(jr.normal(key, _bshape(_shape(kw), scale))),
    _half(lambda v, scale=1.0, **kw: jss.norm.logpdf(v, 0.0, scale)),
)

half_cauchy = _register(
    "half_cauchy",
    lambda key, loc=0.0, scale=1.0, **kw: loc
    + scale * jnp.abs(jr.cauchy(key, _bshape(_shape(kw), loc, scale))),
    lambda v, loc=0.0, scale=1.0, **kw: jnp.where(
        v >= loc, jnp.log(2.0) + jss.cauchy.logpdf(v, loc, scale), -jnp.inf
    ),
)

half_student_t = _register(
    "half_student_t",
    lambda key, df, loc=0.0, scale=1.0, **kw: loc
    + scale * jnp.abs(jr.t(key, df, _bshape(_shape(kw), df, loc, scale))),
    lambda v, df, loc=0.0, scale=1.0, **kw: jnp.where(
        v >= loc, jnp.log(2.0) + jss.t.logpdf(v, df, loc, scale), -jnp.inf
    ),
)

uniform = _register(
    "uniform",
    lambda key, low=0.0, high=1.0, **kw: jr.uniform(
        key, _bshape(_shape(kw), low, high), minval=low, maxval=high
    ),
    lambda v, low=0.0, high=1.0, **kw: jss.uniform.logpdf(v, low, high - low),
)

beta = _register(
    "beta",
    lambda key, concentration1, concentration0, **kw: jr.beta(
        key, concentration1, concentration0, _bshape(_shape(kw), concentration1, concentration0)
    ),
    lambda v, concentration1, concentration0, **kw: jss.beta.logpdf(
        v, concentration1, concentration0
    ),
)

exponential = _register(
    "exponential",
    lambda key, rate, **kw: jr.exponential(key, _bshape(_shape(kw), rate)) / rate,
    lambda v, rate, **kw: jnp.where(
        v >= 0.0, jnp.log(rate) - rate * v, -jnp.inf
    ),
)

gamma = _register(
    "gamma",
    lambda key, concentration, rate=1.0, **kw: jr.gamma(
        key, concentration, _bshape(_shape(kw), concentration, rate)
    )
    / rate,
    lambda v, concentration, rate=1.0, **kw: jss.gamma.logpdf(
        v, concentration, scale=1.0 / rate
    ),
)


def _inverse_gamma_logpdf(v, concentration, scale, **kw):
    return jnp.where(
        v > 0.0,
        xlogy(concentration, scale)
        - gammaln(concentration)
        - (concentration + 1.0) * jnp.log(v)
        - scale / v,
        -jnp.inf,
    )


inverse_gamma = _register(
    "inverse_gamma",
    lambda key, concentration, scale, **kw: scale
    / jr.gamma(key, concentration, _bshape(_shape(kw), concentration, scale)),
    _inverse_gamma_logpdf,
)


def _chi_logpdf(v, df, **kw):
    return jnp.where(
        v > 0.0,
        (df - 1.0) * jnp.log(v)
        - v**2 / 2.0
        - (df / 2.0 - 1.0) * jnp.log(2.0)
        - gammaln(df / 2.0),
        -jnp.inf,
    )


chi = _register(
    "chi",
    lambda key, df, **kw: jnp.sqrt(jr.chisquare(key, df, _bshape(_shape(kw), df))),
    _chi_logpdf,
)

chi2 = _register(
    "chi2",
    lambda key, df, **kw: jr.chisquare(key, df, _bshape(_shape(kw), df)),
    lambda v, df, **kw: jss.chi2.logpdf(v, df),
)


def _weibull_logpdf(v, concentration, scale, **kw):
    k, lam = concentration, scale
    z = v / lam
    return jnp.where(
        v >= 0.0,
        jnp.log(k) - jnp.log(lam) + xlogy(k - 1.0, z) - z**k,
        -jnp.inf,
    )


weibull = _register(
    "weibull",
    lambda key, concentration, scale, **kw: jr.weibull_min(
        key, scale, concentration, _bshape(_shape(kw), concentration, scale)
    ),
    _weibull_logpdf,
)

log_normal = _register(
    "log_normal",
    lambda key, loc=0.0, scale=1.0, **kw: jnp.exp(
        loc + scale * jr.normal(key, _bshape(_shape(kw), loc, scale))
    ),
    lambda v, loc=0.0, scale=1.0, **kw: jnp.where(
        v > 0.0, jss.norm.logpdf(jnp.log(v), loc, scale) - jnp.log(v), -jnp.inf
    ),
)


def _logit_normal_logpdf(v, loc=0.0, scale=1.0, **kw):
    logit = jnp.log(v) - jnp.log1p(-v)
    return (
        jss.norm.logpdf(logit, loc, scale) - jnp.log(v) - jnp.log1p(-v)
    )


logit_normal = _register(
    "logit_normal",
    lambda key, loc=0.0, scale=1.0, **kw: jax.nn.sigmoid(
        loc + scale * jr.normal(key, _bshape(_shape(kw), loc, scale))
    ),
    _logit_normal_logpdf,
)


def _truncated_normal_sample(key, loc, scale, low, high, **kw):
    a = (low - loc) / scale
    b = (high - loc) / scale
    return loc + scale * jr.truncated_normal(
        key, a, b, _bshape(_shape(kw), loc, scale, low, high)
    )


def _truncated_normal_logpdf(v, loc, scale, low, high, **kw):
    a = (low - loc) / scale
    b = (high - loc) / scale
    # log(Φ(b) − Φ(a)) in log space: ndtr saturates to 1 for z ≳ 6 in f32,
    # making the plain difference 0 (and the score +inf) for tail windows.
    # Work on the side where the CDF is small: for a ≥ 0 use symmetry
    # Φ(b)−Φ(a) = Φ(−a)−Φ(−b); logsumexp-style difference of log_ndtr.
    from jax.scipy.special import log_ndtr

    def log_diff(lo, hi):  # log(exp(hi_cdf) − exp(lo_cdf)) with hi≥lo
        hi_l = log_ndtr(hi)
        lo_l = log_ndtr(lo)
        return hi_l + jnp.log1p(-jnp.exp(lo_l - hi_l))

    flip = a >= 0.0  # both bounds in the upper tail: reflect
    lz = jnp.where(
        flip,
        log_diff(-b, -a),
        log_diff(a, b),
    )
    lp = jss.norm.logpdf(v, loc, scale) - lz
    return jnp.where((v >= low) & (v <= high), lp, -jnp.inf)


truncated_normal = _register(
    "truncated_normal", _truncated_normal_sample, _truncated_normal_logpdf
)


def _cauchy_cdf(v, loc, scale):
    return 0.5 + jnp.arctan((v - loc) / scale) / jnp.pi


def _truncated_cauchy_sample(key, loc, scale, low, high, **kw):
    fa = _cauchy_cdf(low, loc, scale)
    fb = _cauchy_cdf(high, loc, scale)
    u = jr.uniform(key, _bshape(_shape(kw), loc, scale, low, high))
    p = fa + u * (fb - fa)
    return loc + scale * jnp.tan(jnp.pi * (p - 0.5))


def _truncated_cauchy_logpdf(v, loc, scale, low, high, **kw):
    fa = _cauchy_cdf(low, loc, scale)
    fb = _cauchy_cdf(high, loc, scale)
    lp = jss.cauchy.logpdf(v, loc, scale) - jnp.log(fb - fa)
    return jnp.where((v >= low) & (v <= high), lp, -jnp.inf)


truncated_cauchy = _register(
    "truncated_cauchy", _truncated_cauchy_sample, _truncated_cauchy_logpdf
)


def _kumaraswamy_logpdf(v, concentration1, concentration0, **kw):
    a, b = concentration1, concentration0
    return jnp.where(
        (v > 0.0) & (v < 1.0),
        jnp.log(a) + jnp.log(b) + xlogy(a - 1.0, v) + xlog1py(b - 1.0, -(v**a)),
        -jnp.inf,
    )


kumaraswamy = _register(
    "kumaraswamy",
    lambda key, concentration1, concentration0, **kw: (
        1.0
        - (
            1.0
            - jr.uniform(
                key, _bshape(_shape(kw), concentration1, concentration0), minval=1e-7, maxval=1.0
            )
        )
        ** (1.0 / concentration0)
    )
    ** (1.0 / concentration1),
    _kumaraswamy_logpdf,
)


def _moyal_logpdf(v, loc=0.0, scale=1.0, **kw):
    z = (v - loc) / scale
    return -0.5 * (z + jnp.exp(-z)) - 0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(scale)


def _moyal_sample(key, loc=0.0, scale=1.0, **kw):
    u = jr.uniform(key, _bshape(_shape(kw), loc, scale), minval=1e-7, maxval=1.0 - 1e-7)
    z = -2.0 * jnp.log(jnp.sqrt(2.0) * special.erfcinv(u))
    return loc + scale * z


moyal = _register("moyal", _moyal_sample, _moyal_logpdf)


def _dsmaxwell_logpdf(v, loc=0.0, scale=1.0, **kw):
    z = (v - loc) / scale
    return (
        2.0 * jnp.log(jnp.abs(z) + 1e-30)
        - z**2 / 2.0
        - 0.5 * jnp.log(2.0 * jnp.pi)
        - jnp.log(scale)
    )


double_sided_maxwell = _register(
    "double_sided_maxwell",
    lambda key, loc=0.0, scale=1.0, **kw: jr.double_sided_maxwell(
        key, loc, scale, _bshape(_shape(kw), loc, scale)
    ),
    _dsmaxwell_logpdf,
)


def _exp_gamma_logpdf(v, concentration, rate=1.0, **kw):
    return (
        xlogy(concentration, rate)
        + concentration * v
        - rate * jnp.exp(v)
        - gammaln(concentration)
    )


exp_gamma = _register(
    "exp_gamma",
    lambda key, concentration, rate=1.0, **kw: jr.loggamma(
        key, concentration, _bshape(_shape(kw), concentration, rate)
    )
    - jnp.log(rate),
    _exp_gamma_logpdf,
)


def _exp_inverse_gamma_logpdf(v, concentration, scale=1.0, **kw):
    return (
        xlogy(concentration, scale)
        - concentration * v
        - scale * jnp.exp(-v)
        - gammaln(concentration)
    )


exp_inverse_gamma = _register(
    "exp_inverse_gamma",
    lambda key, concentration, scale=1.0, **kw: jnp.log(scale)
    - jr.loggamma(key, concentration, _bshape(_shape(kw), concentration, scale)),
    _exp_inverse_gamma_logpdf,
)


def _inverse_gaussian_logpdf(v, loc, concentration, **kw):
    mu, lam = loc, concentration
    return jnp.where(
        v > 0.0,
        0.5 * (jnp.log(lam) - jnp.log(2.0 * jnp.pi) - 3.0 * jnp.log(v))
        - lam * (v - mu) ** 2 / (2.0 * mu**2 * v),
        -jnp.inf,
    )


inverse_gaussian = _register(
    "inverse_gaussian",
    lambda key, loc, concentration, **kw: concentration
    * jr.wald(
        key, loc / concentration, _bshape(_shape(kw), loc, concentration)
    ),
    _inverse_gaussian_logpdf,
)


def _von_mises_logpdf(v, loc, concentration, **kw):
    return (
        concentration * jnp.cos(v - loc)
        - jnp.log(2.0 * jnp.pi)
        - special.log_bessel_i0(concentration)
    )


von_mises = _register(
    "von_mises",
    lambda key, loc, concentration, **kw: special.von_mises_sample(
        key, loc, concentration, _shape(kw)
    ),
    _von_mises_logpdf,
)


def _lambert_w_normal_sample(key, loc=0.0, scale=1.0, tailweight=0.0, **kw):
    u = jr.normal(key, _bshape(_shape(kw), loc, scale, tailweight))
    return loc + scale * u * jnp.exp(tailweight / 2.0 * u**2)


def _lambert_w_normal_logpdf(v, loc=0.0, scale=1.0, tailweight=0.0, **kw):
    z = (v - loc) / scale
    delta = tailweight
    # inverse transform: u = sign(z) * sqrt(W(delta z^2) / delta)
    wz = special.lambertw(delta * z**2)
    u = jnp.sign(z) * jnp.sqrt(jnp.maximum(wz / jnp.where(delta == 0.0, 1.0, delta), 0.0))
    u = jnp.where(delta == 0.0, z, u)
    # |du/dz| = u / (z (1 + W))  (for delta != 0); 1 for delta == 0.
    # The delta != 0 form is 0/0 at z = 0 with limit 1 (W(δz²) ≈ δz², so
    # u ≈ z): guard tiny |z| or a value exactly at loc scores -inf-ish
    dudz = jnp.where(
        (delta == 0.0) | (jnp.abs(z) < 1e-6),
        1.0,
        jnp.abs(u) / jnp.maximum(jnp.abs(z) * (1.0 + wz), 1e-30),
    )
    return jss.norm.logpdf(u) + jnp.log(jnp.maximum(dudz, 1e-30)) - jnp.log(scale)


lambert_w_normal = _register(
    "lambert_w_normal", _lambert_w_normal_sample, _lambert_w_normal_logpdf
)


# ----------------------------------------------------------------------
# discrete families
# ----------------------------------------------------------------------


def _bernoulli_logits_logpmf(v, logits=None, **kw):
    l = logits
    v = jnp.asarray(v, jnp.float32)
    return v * l - jax.nn.softplus(l)


bernoulli = _register(
    "bernoulli",
    lambda key, logits=None, **kw: jr.bernoulli(
        key, jax.nn.sigmoid(logits), _bshape(_shape(kw), logits)
    ).astype(jnp.int32),
    _bernoulli_logits_logpmf,
)

flip = _register(
    "flip",
    lambda key, p, **kw: jr.bernoulli(key, p, _bshape(_shape(kw), p)),
    lambda v, p, **kw: xlogy(jnp.asarray(v, jnp.float32), p)
    + xlog1py(1.0 - jnp.asarray(v, jnp.float32), -p),
)


def _categorical_logpmf(v, logits, **kw):
    logits = jnp.asarray(logits)
    vi = jnp.asarray(v, jnp.int32)
    # TFP batch semantics: a batched value against one logits vector
    # scores elementwise — broadcast the batch shapes before the gather
    batch = jnp.broadcast_shapes(jnp.shape(vi), jnp.shape(logits)[:-1])
    logits_b = jnp.broadcast_to(logits, batch + jnp.shape(logits)[-1:])
    vi_b = jnp.broadcast_to(vi, batch)
    lse = logsumexp(logits_b, axis=-1)
    picked = jnp.take_along_axis(
        logits_b, vi_b[..., None], axis=-1
    ).squeeze(-1)
    return jnp.where(
        (vi_b >= 0) & (vi_b < logits.shape[-1]), picked - lse, -jnp.inf
    )


categorical = _register(
    "categorical",
    lambda key, logits, **kw: jr.categorical(
        key, logits, shape=_bshape(_shape(kw), jnp.shape(logits)[:-1]) or None
    ),
    _categorical_logpmf,
)


def _binomial_logpmf(v, total_count, logits=None, **kw):
    n = jnp.asarray(total_count, jnp.float32)
    k = jnp.asarray(v, jnp.float32)
    comb = gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)
    lp = comb + k * logits - n * jax.nn.softplus(logits)
    valid = (k >= 0) & (k <= n)
    return jnp.where(valid, lp, -jnp.inf)


binomial = _register(
    "binomial",
    lambda key, total_count, logits=None, **kw: jr.binomial(
        key,
        total_count,
        jax.nn.sigmoid(logits),
        _bshape(_shape(kw), total_count, logits),
    ),
    _binomial_logpmf,
)


def _geometric_logpmf(v, logits, **kw):
    k = jnp.asarray(v, jnp.float32)
    return jnp.where(
        k >= 0, logits - (k + 1.0) * jax.nn.softplus(logits), -jnp.inf
    )


geometric = _register(
    "geometric",
    # TFP Geometric counts failures before the first success (support 0,1,..);
    # jax.random.geometric counts trials (support 1,2,..) — shift by one.
    lambda key, logits, **kw: jr.geometric(
        key, jax.nn.sigmoid(logits), _bshape(_shape(kw), logits)
    )
    - 1,
    _geometric_logpmf,
)

poisson = _register(
    "poisson",
    lambda key, rate, **kw: jr.poisson(key, rate, _bshape(_shape(kw), rate)),
    lambda v, rate, **kw: jss.poisson.logpmf(v, rate),
)


def _negative_binomial_logpmf(v, total_count, logits, **kw):
    n = jnp.asarray(total_count, jnp.float32)
    k = jnp.asarray(v, jnp.float32)
    lp = (
        gammaln(k + n)
        - gammaln(n)
        - gammaln(k + 1.0)
        + k * (logits - jax.nn.softplus(logits))
        - n * jax.nn.softplus(logits)
    )
    return jnp.where(k >= 0, lp, -jnp.inf)


def _negative_binomial_sample(key, total_count, logits, **kw):
    k1, k2 = jr.split(key)
    p = jax.nn.sigmoid(logits)
    shape = _bshape(_shape(kw), total_count, logits)
    lam = jr.gamma(k1, total_count, shape) * (p / (1.0 - p))
    return jr.poisson(k2, lam, shape)


negative_binomial = _register(
    "negative_binomial", _negative_binomial_sample, _negative_binomial_logpmf
)


def _beta_binomial_logpmf(v, total_count, concentration1, concentration0, **kw):
    n = jnp.asarray(total_count, jnp.float32)
    k = jnp.asarray(v, jnp.float32)
    a, b = concentration1, concentration0
    lp = (
        gammaln(n + 1.0)
        - gammaln(k + 1.0)
        - gammaln(n - k + 1.0)
        + betaln(k + a, n - k + b)
        - betaln(a, b)
    )
    return jnp.where((k >= 0) & (k <= n), lp, -jnp.inf)


def _beta_binomial_sample(key, total_count, concentration1, concentration0, **kw):
    k1, k2 = jr.split(key)
    shape = _bshape(_shape(kw), total_count, concentration1, concentration0)
    p = jr.beta(k1, concentration1, concentration0, shape)
    return jr.binomial(k2, total_count, p, shape)


beta_binomial = _register("beta_binomial", _beta_binomial_sample, _beta_binomial_logpmf)


def _skellam_logpmf(v, rate1, rate2, **kw):
    k = jnp.asarray(v, jnp.float32)
    mu1, mu2 = jnp.asarray(rate1, jnp.float32), jnp.asarray(rate2, jnp.float32)
    return (
        -(mu1 + mu2)
        + 0.5 * k * (jnp.log(mu1) - jnp.log(mu2))
        + special.log_bessel_iv(jnp.abs(k), 2.0 * jnp.sqrt(mu1 * mu2))
    )


def _skellam_sample(key, rate1, rate2, **kw):
    k1, k2 = jr.split(key)
    shape = _bshape(_shape(kw), rate1, rate2)
    return (
        jr.poisson(k1, rate1, shape) - jr.poisson(k2, rate2, shape)
    )


skellam = _register("skellam", _skellam_sample, _skellam_logpmf)


def _zipf_logpmf(v, power, **kw):
    k = jnp.asarray(v, jnp.float32)
    return jnp.where(
        k >= 1.0, -power * jnp.log(k) - jnp.log(zeta(power, 1.0)), -jnp.inf
    )


zipf = _register(
    "zipf",
    lambda key, power, **kw: special.zipf_sample(key, power, _shape(kw)),
    _zipf_logpmf,
)


def _non_central_chi2_logpdf(v, df, noncentrality, **kw):
    x = jnp.asarray(v, jnp.float32)
    nc = jnp.asarray(noncentrality, jnp.float32)
    hd = df / 2.0 - 1.0
    lp = (
        -jnp.log(2.0)
        - (x + nc) / 2.0
        + hd / 2.0 * (jnp.log(x) - jnp.log(jnp.maximum(nc, 1e-30)))
        + special.log_bessel_iv(hd, jnp.sqrt(jnp.maximum(nc * x, 0.0)))
    )
    central = jss.chi2.logpdf(x, df)
    lp = jnp.where(nc < 1e-10, central, lp)
    return jnp.where(x > 0.0, lp, -jnp.inf)


def _non_central_chi2_sample(key, df, noncentrality, **kw):
    k1, k2 = jr.split(key)
    shape = _bshape(_shape(kw), df, noncentrality)
    j = jr.poisson(k1, noncentrality / 2.0, shape)
    return jr.chisquare(k2, df + 2.0 * j, shape)


non_central_chi2 = _register(
    "non_central_chi2", _non_central_chi2_sample, _non_central_chi2_logpdf
)


# ----------------------------------------------------------------------
# event-dimension families
# ----------------------------------------------------------------------

dirichlet = _register(
    "dirichlet",
    lambda key, concentration, **kw: jr.dirichlet(
        key, concentration, _bshape(_shape(kw), jnp.shape(concentration)[:-1]) or None
    ),
    lambda v, concentration, **kw: jss.dirichlet.logpdf(v, concentration),
)


def _multinomial_logpmf(v, total_count, logits, **kw):
    x = jnp.asarray(v, jnp.float32)
    n = jnp.asarray(total_count, jnp.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    return (
        gammaln(n + 1.0)
        - jnp.sum(gammaln(x + 1.0), axis=-1)
        + jnp.sum(x * logp, axis=-1)
    )


def _multinomial_sample(key, total_count, logits, **kw):
    # read sample_shape ONCE (_shape pops the kwarg; calling it twice in
    # one expression silently dropped the requested draws)
    s = tuple(_shape(kw))
    shape = None
    if s:
        shape = _bshape(
            s, jnp.shape(logits)[:-1], jnp.shape(total_count)
        ) + (jnp.shape(logits)[-1],)
    return jr.multinomial(
        key,
        total_count,
        jax.nn.softmax(jnp.asarray(logits), axis=-1),
        shape=shape,
    )


multinomial = _register(
    "multinomial", _multinomial_sample, _multinomial_logpmf
)


def _dirichlet_multinomial_logpmf(v, total_count, concentration, **kw):
    x = jnp.asarray(v, jnp.float32)
    n = jnp.asarray(total_count, jnp.float32)
    a = jnp.asarray(concentration, jnp.float32)
    a0 = jnp.sum(a, axis=-1)
    return (
        gammaln(n + 1.0)
        - jnp.sum(gammaln(x + 1.0), axis=-1)
        + gammaln(a0)
        - gammaln(n + a0)
        + jnp.sum(gammaln(x + a) - gammaln(a), axis=-1)
    )


def _dirichlet_multinomial_sample(key, total_count, concentration, **kw):
    k1, k2 = jr.split(key)
    s = _shape(kw)
    batch = _bshape(s, jnp.shape(concentration)[:-1])
    p = jr.dirichlet(k1, concentration, shape=batch or None)
    n = jnp.broadcast_to(jnp.asarray(total_count), batch)
    return jr.multinomial(k2, n, p)


dirichlet_multinomial = _register(
    "dirichlet_multinomial",
    _dirichlet_multinomial_sample,
    _dirichlet_multinomial_logpmf,
)


def _mv_normal_diag_logpdf(v, loc, scale_diag, **kw):
    return jnp.sum(jss.norm.logpdf(v, loc, scale_diag), axis=-1)


mv_normal_diag = _register(
    "mv_normal_diag",
    lambda key, loc, scale_diag, **kw: loc
    + scale_diag
    * jr.normal(key, _bshape(_shape(kw), loc, scale_diag)),
    _mv_normal_diag_logpdf,
)

mv_normal = _register(
    "mv_normal",
    lambda key, loc, covariance_matrix, **kw: jr.multivariate_normal(
        key, loc, covariance_matrix, _shape(kw) or None
    ),
    lambda v, loc, covariance_matrix, **kw: jss.multivariate_normal.logpdf(
        v, loc, covariance_matrix
    ),
)

power_spherical = _register(
    "power_spherical",
    _iid(special.power_spherical_sample),
    lambda v, mean_direction, concentration, **kw: special.power_spherical_logpdf(
        v, mean_direction, concentration
    ),
)

von_mises_fisher = _register(
    "von_mises_fisher",
    _iid(special.von_mises_fisher_sample),
    lambda v, mean_direction, concentration, **kw: special.von_mises_fisher_logpdf(
        v, mean_direction, concentration
    ),
)


# ----------------------------------------------------------------------
# quotient family (quadrature-based density)
# ----------------------------------------------------------------------


def _beta_quotient_sample(
    key, concentration1_numerator, concentration0_numerator,
    concentration1_denominator, concentration0_denominator, **kw,
):
    k1, k2 = jr.split(key)
    shape = _bshape(
        _shape(kw),
        concentration1_numerator,
        concentration0_numerator,
        concentration1_denominator,
        concentration0_denominator,
    )
    x = jr.beta(k1, concentration1_numerator, concentration0_numerator, shape)
    y = jr.beta(k2, concentration1_denominator, concentration0_denominator, shape)
    return x / y


def _beta_quotient_logpdf(
    v, concentration1_numerator, concentration0_numerator,
    concentration1_denominator, concentration0_denominator, **kw,
):
    """Density of X/Y for independent Betas via fixed-node Gauss-Legendre
    quadrature over the denominator: f(z) = ∫ f_X(z y) f_Y(y) y dy with
    y ∈ (0, min(1, 1/z))."""
    a1, b1 = concentration1_numerator, concentration0_numerator
    a2, b2 = concentration1_denominator, concentration0_denominator
    z = jnp.asarray(v, jnp.float32)
    nodes, weights = special.gauss_legendre(128)
    upper = jnp.minimum(1.0, 1.0 / jnp.maximum(z, 1e-30))

    def integrand(y):
        return jnp.exp(
            jss.beta.logpdf(jnp.clip(z * y, 1e-30, 1.0 - 1e-7), a1, b1)
            + jss.beta.logpdf(jnp.clip(y, 1e-30, 1.0 - 1e-7), a2, b2)
            + jnp.log(y)
        )

    y = nodes[(...,) + (None,) * jnp.ndim(z)] * upper
    vals = integrand(y)
    integral = jnp.sum(weights[(...,) + (None,) * jnp.ndim(z)] * vals, axis=0) * upper
    return jnp.where(z > 0.0, jnp.log(jnp.maximum(integral, 1e-38)), -jnp.inf)


beta_quotient = _register(
    "beta_quotient", _beta_quotient_sample, _beta_quotient_logpdf
)

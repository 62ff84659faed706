"""Checkpoint/resume for long-running inference jobs.

No reference counterpart (SURVEY.md §5: the reference has no
checkpointing). Because every framework object — traces, particle
collections, adaptation state — is a pytree of arrays, a job's full state
saves and restores with orbax (`genjax_tpu.io`); static structure rides in
the treedef and is rebuilt from code.

Two levels shown here:

1. **The wired-in driver** — ``sample_posterior(checkpoint_dir=...,
   checkpoint_every=k)`` checkpoints the full sampler state (chains,
   adapted step size/mass, draws-so-far) every ``k`` draws; re-invoking
   with the same arguments after a preemption resumes at the last
   completed segment and returns the BITWISE result of the uninterrupted
   run (per-draw keys are pre-split from the caller key, so segment
   boundaries never change the stream). ``max_segments`` bounds one
   call's work — time-budgeted slices on preemptible quota.
2. **The manual primitive** — ``save_pytree``/``restore_pytree`` on any
   chain state, for custom drivers.
"""

import shutil
import tempfile

import jax
import jax.numpy as jnp
import jax.random as jr

import genjax_tpu as g
from genjax_tpu.io import restore_pytree, save_pytree


@g.gen
def model():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


OBS = g.C["y"].set(2.0)
N_CHAINS = 128


def init_traces(key):
    return jax.vmap(lambda k: model.generate(k, OBS, ())[0])(
        jr.split(key, N_CHAINS)
    )


@jax.jit
def run_segment(key, traces, n_steps=20):
    def step(trs, kk):
        ks = jr.split(kk, N_CHAINS)
        trs, accs = jax.vmap(
            lambda k, t: g.mh(k, t, g.HMC(g.S["mu"], 0.3, L=5))
        )(ks, trs)
        return trs, jnp.mean(accs)

    traces, accs = jax.lax.scan(step, traces, jr.split(key, n_steps))
    return traces, jnp.mean(accs)


def driver_resume_demo(workdir):
    """The production path: preemption-safe ``sample_posterior``."""
    from genjax_tpu.inference.sample import sample_posterior

    kw = dict(
        n_chains=64, n_warmup=30, n_samples=20, algorithm="hmc",
        eps0=0.3, L=3, checkpoint_dir=f"{workdir}/driver",
        checkpoint_every=5,
    )
    # "preempted" run: the quota allowed only 2 of 4 segments
    partial = sample_posterior(
        jr.key(11), model, OBS, (), g.S["mu"], **kw, max_segments=2
    )
    assert partial["mu"].shape[1] == 10  # 2 segments x 5 draws
    # later (fresh process in real life): same call, resumes + completes
    full = sample_posterior(jr.key(11), model, OBS, (), g.S["mu"], **kw)
    assert full["mu"].shape == (64, 20)
    # and equals the never-interrupted run bitwise
    import numpy as np

    uninterrupted = sample_posterior(
        jr.key(11), model, OBS, (), g.S["mu"],
        **{k: v for k, v in kw.items()
           if k not in ("checkpoint_dir", "checkpoint_every")},
    )
    assert np.array_equal(np.asarray(full["mu"]),
                          np.asarray(uninterrupted["mu"]))
    print("sample_posterior resume: bitwise continuation OK")


def main():
    workdir = tempfile.mkdtemp(prefix="genjax_ckpt_")
    try:
        driver_resume_demo(workdir)
        # --- segment 1: run, then checkpoint the full chain state ------
        traces = init_traces(jr.key(0))
        traces, _ = run_segment(jr.key(1), traces)
        save_pytree(f"{workdir}/chains", traces)

        # --- segment 2a: continue in THIS process ----------------------
        cont, _ = run_segment(jr.key(2), traces)

        # --- segment 2b: "fresh process": rebuild the static template
        # from code, restore the leaves, continue with the same keys ----
        template = init_traces(jr.key(0))  # structure only
        restored = restore_pytree(f"{workdir}/chains", template)
        resumed, _ = run_segment(jr.key(2), restored)

        # bit-exact resumption: the restored run reproduces the original
        for a, b in zip(
            jax.tree_util.tree_leaves(cont),
            jax.tree_util.tree_leaves(resumed),
        ):
            assert jnp.array_equal(a, b), "resume diverged from original"

        # and the chains are sampling the right posterior
        mus = resumed.get_choices()["mu"]
        assert abs(float(jnp.mean(mus)) - 1.0) < 0.2
        print("checkpoint/resume cookbook: bit-exact resumption OK")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()

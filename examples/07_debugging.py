"""The time-travel debugger.

Port of /root/reference/docs/cookbook/active/debugging.ipynb: step through a
computation at tagged record points, rewind, and re-mix from the middle with
new values.
"""

import jax.numpy as jnp

from genjax_tpu.debug import rec, tag, time_machine


def pipeline(x):
    doubled = rec(lambda a: a * 2.0, "double")(x)
    shifted = rec(lambda a: a + 10.0, "shift")(doubled)
    return tag(shifted**2, "squared")


def main():
    dbg = time_machine(pipeline)(3.0)
    print("final:", dbg.final_retval)
    print("recorded frames:", [f.debug_tag for f in dbg.sequence])

    # jump to a point and inspect
    at = dbg.jump("shift")
    tag_, frame = at.frame()
    print(f"at {tag_}: args={frame.args} local={frame.local_retval}")

    # step around
    print("fwd ->", at.fwd().frame()[0], " bwd ->", at.bwd().frame()[0])

    # remix: rerun from `shift` with a different input
    alt = at.remix(100.0)
    print("remixed final:", alt.final_retval, "(= (100+10)^2)")


if __name__ == "__main__":
    main()

"""Choice maps and selections: builders and algebra.

Port of /root/reference/docs/cookbook/active/choice_maps.ipynb.
"""

import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import C, S


def main():
    # builders
    c1 = C["x"].set(1.0)
    c2 = C["outer", "inner"].set(2.0)
    c3 = g.ChoiceMap.d({"a": 3.0, ("b", "c"): 4.0})
    c4 = g.ChoiceMap.kw(u=5.0, v=6.0)

    # hierarchical access
    print(c2["outer", "inner"], c3["b", "c"])

    # merge is left-priority
    merged = C["x"].set(10.0) | c1
    print("left priority:", merged["x"])  # 10.0

    # indexed (dense) choice maps: the layout of scan/vmap traces
    dense = C[:, "z"].set(jnp.arange(5.0))
    print("dense read:", dense[2, "z"])

    # filtering by selections
    chm = g.ChoiceMap.d({"x": 1.0, "y": 2.0})
    only_x = chm.filter(S["x"])
    print("filtered:", only_x.get_submap("x").get_value(), only_x.get_submap("y").static_is_empty() or only_x.get_submap("y").get_value())

    # selection algebra
    sel = S["x"] | S["y", "inner"]
    print("sel checks:", sel("x").check(), sel("y")("inner").check(), sel("z").check())
    comp = ~S["x"]
    print("complement:", comp("x").check(), comp("y").check())

    # masks: fixed-shape sum types
    m = g.Mask(jnp.asarray(3.0), jnp.asarray(True))
    print("mask:", m.unmask(), (~m).primal_flag())


if __name__ == "__main__":
    main()

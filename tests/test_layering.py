"""Layer-direction and import-acyclicity enforcement (VERDICT r3 item 4).

ARCHITECTURE.md's layer diagram is enforced here so a cross-layer import
is caught at commit time, not at round end. Two properties:

1. **Subpackage layer order** — every module-level (import-time) edge
   between subpackages must point strictly *downward* in `LAYERS`.
   Function-local (lazy) imports are exempt: they execute after the
   package is fully initialized and cannot form an import-time cycle.

2. **Whole-graph acyclicity under real import semantics** — Python imports
   a submodule's package ``__init__`` first, and this repo's facades fan in
   eagerly, so the *effective* graph includes an edge ``X → P/__init__``
   for every ``X`` importing any ``P.M``. The round-3 breakage
   (``kernels/chees.py`` → ``inference.adaptation`` → ``inference/__init__``
   → ``smc_chees`` → ``kernels.chees`` partially initialized) is exactly a
   cycle in this graph; we assert there are none, anywhere.

Layering (low → high) per ARCHITECTURE.md §Layering, with the round-4
amendment that ``kernels/`` and ``parallel/`` sit BELOW ``inference/``
(inference drivers compose column kernels and collective resampling; the
shared adaptation estimators live in ``kernels/adaptation.py``).
"""

import ast
import os
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "genjax_tpu"
PKG_ROOT = os.path.join(REPO, PKG)

# Low → high. Modules at the package root are assigned by name below;
# subpackages by directory. An edge A → B requires layer(A) >= layer(B),
# with equality allowed only inside the same subpackage (or between the
# named root leaf modules, which are mutual leaves).
LAYERS = {
    "core": 0,
    "checkify": 1,
    "typecheck": 1,
    "generative": 2,
    "lang": 3,
    "dists": 3,
    "combinators": 3,
    "adev": 4,
    "models": 4,
    "kernels": 5,
    "parallel": 6,
    "inference": 7,
    "debug": 8,
    "io": 8,
    # root facades — top of the world
    "<root>": 9,
    "typing": 9,
    "incremental": 9,
    "time_travel": 9,
    "experimental": 9,
    "pretty": 9,
}


def _module_name(path):
    rel = os.path.relpath(path, REPO)[: -len(".py")]
    parts = rel.split(os.sep)
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts)


def _subpackage(modname):
    parts = modname.split(".")
    if len(parts) == 1:
        return "<root>"
    if len(parts) == 2 and os.path.isfile(
        os.path.join(PKG_ROOT, parts[1] + ".py")
    ):
        return parts[1]  # root leaf module (checkify, typing, ...)
    return parts[1]


def _iter_py_files():
    for root, dirs, files in os.walk(PKG_ROOT):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                yield os.path.join(root, f)


def _module_level_imports(path, modname):
    """Yield absolute genjax_tpu module names imported at module level
    (direct children of Module, plus bodies of top-level if/try/with —
    those still run at import time). Function/class bodies are lazy."""
    tree = ast.parse(open(path).read(), filename=path)
    parts = modname.split(".")
    is_pkg = os.path.basename(path) == "__init__.py"

    def resolve(node):
        out = []
        if isinstance(node, ast.ImportFrom):
            if node.level > 0:
                # package containing this module:
                base = parts if is_pkg else parts[:-1]
                base = base[: len(base) - (node.level - 1)]
                target = base + (node.module.split(".") if node.module else [])
                out.append(".".join(target))
                if node.module is None:
                    # `from . import a, b` — each name may be a submodule
                    for alias in node.names:
                        out.append(".".join(target + [alias.name]))
            elif node.module and node.module.split(".")[0] == PKG:
                out.append(node.module)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.split(".")[0] == PKG:
                    out.append(alias.name)
        return out

    def walk(node):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.Import, ast.ImportFrom)):
                yield from resolve(child)
            elif isinstance(child, (ast.If, ast.Try, ast.With)):
                # TYPE_CHECKING blocks never execute at runtime
                if isinstance(child, ast.If):
                    t = child.test
                    if (isinstance(t, ast.Name) and t.id == "TYPE_CHECKING") or (
                        isinstance(t, ast.Attribute)
                        and t.attr == "TYPE_CHECKING"
                    ):
                        continue
                yield from walk(child)

    yield from walk(tree)


def _build_graph():
    all_mods = {}
    for path in _iter_py_files():
        all_mods[_module_name(path)] = path
    edges = defaultdict(set)
    for modname, path in all_mods.items():
        for target in _module_level_imports(path, modname):
            # normalize to an existing module (an imported NAME may be a
            # symbol of the parent, not a submodule)
            while target and target not in all_mods:
                target = ".".join(target.split(".")[:-1])
            if not target or target == modname:
                continue
            # a module's own ancestor packages are always already on the
            # import stack — not a dependency edge
            if modname.startswith(target + "."):
                continue
            edges[modname].add(target)
            # Real import semantics: importing P.M first initializes every
            # ancestor package P — EXCEPT ancestors shared with the
            # importing module, which are guaranteed to already be on the
            # import stack (partially initialized is fine for submodule
            # resolution). The r3 cycle was exactly a non-shared ancestor:
            # kernels/chees.py -> inference.adaptation dragged in ALL of
            # inference/__init__'s eager fan-in.
            anc = target.split(".")
            while len(anc) > 1:
                anc = anc[:-1]
                pkg = ".".join(anc)
                if (
                    pkg in all_mods
                    and pkg != modname
                    and not modname.startswith(pkg + ".")
                ):
                    edges[modname].add(pkg)
    # package __init__ → its eager imports are already captured above.
    return all_mods, edges


def test_layer_direction():
    all_mods, edges = _build_graph()
    violations = []
    for src, targets in edges.items():
        s_sub = _subpackage(src)
        for dst in targets:
            d_sub = _subpackage(dst)
            if s_sub == d_sub:
                continue
            ls, ld = LAYERS[s_sub], LAYERS[d_sub]
            if ls < ld or (ls == ld and s_sub != d_sub and ls not in (1, 9)):
                violations.append(f"{src} (L{ls}) -> {dst} (L{ld})")
    assert not violations, (
        "upward (or cross-layer lateral) module-level imports found — "
        "move the shared code into a lower layer or make the import lazy:\n  "
        + "\n  ".join(sorted(violations))
    )


def test_import_graph_acyclic():
    all_mods, edges = _build_graph()
    # Kahn's algorithm over the effective import graph; report any cycle.
    WHITE, GRAY, BLACK = 0, 1, 2
    color = {m: WHITE for m in all_mods}
    stack_trace = []
    cycles = []

    def dfs(m):
        color[m] = GRAY
        stack_trace.append(m)
        for nxt in sorted(edges.get(m, ())):
            if color[nxt] == GRAY:
                i = stack_trace.index(nxt)
                cycles.append(" -> ".join(stack_trace[i:] + [nxt]))
            elif color[nxt] == WHITE:
                dfs(nxt)
        stack_trace.pop()
        color[m] = BLACK

    for m in sorted(all_mods):
        if color[m] == WHITE:
            dfs(m)
    assert not cycles, (
        "import-time cycles in the effective module graph (this is the "
        "round-3 first-import failure class):\n  " + "\n  ".join(cycles)
    )


def test_kernels_never_import_inference_or_parallel():
    """The concrete r3 regression, pinned explicitly: nothing under
    kernels/ or parallel/ may import inference/ at module level."""
    all_mods, edges = _build_graph()
    bad = [
        f"{src} -> {dst}"
        for src, targets in edges.items()
        if _subpackage(src) in ("kernels", "parallel")
        for dst in targets
        if _subpackage(dst) == "inference"
    ]
    assert not bad, "\n".join(bad)

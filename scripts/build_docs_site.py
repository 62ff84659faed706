"""Build the static documentation site into ``site/``.

The reference ships an mkdocs site (reference mkdocs.yml:1 with nav over
hand-written guides + auto-generated API pages). mkdocs is not in this
image, so this builder produces the same deliverable — a linked,
navigable HTML site — from the pieces the repo already maintains:

- ``docs/*.md``       the guide (index, getting started, API reference,
                      performance, deployment)
- ``examples/*.py``   the 25 CI-executed cookbooks, rendered as
                      highlighted pages with their module docstrings as
                      markdown intros (the reference's notebook gallery)
- root ``README.md`` / ``ARCHITECTURE.md`` / ``COVERAGE.md`` /
  ``SCALING.md``      the project pages

Run: ``python scripts/build_docs_site.py [--out DIR]``. The build fails
loudly on broken internal links; ``tests/test_docs_site.py`` builds the
site and walks every internal href in CI.
"""

import argparse
import ast
import pathlib
import re
import sys

import jinja2
import markdown
from pygments import highlight
from pygments.formatters import HtmlFormatter
from pygments.lexers import PythonLexer

ROOT = pathlib.Path(__file__).resolve().parents[1]

MD_EXTENSIONS = ["fenced_code", "tables", "toc", "codehilite"]

# (source path, output stem, nav title); all guide/project pages land
# flat in the site root so relative links between them stay one-segment
GUIDE_PAGES = [
    ("docs/index.md", "index", "Overview"),
    ("docs/getting_started.md", "getting_started", "Getting started"),
    ("docs/migration.md", "migration", "Migrating from GenJAX"),
    ("docs/api.md", "api", "API reference"),
    ("docs/performance.md", "performance", "Performance"),
    ("docs/deployment.md", "deployment", "Deployment"),
]
PROJECT_PAGES = [
    ("README.md", "readme", "README"),
    ("ARCHITECTURE.md", "architecture", "Architecture"),
    ("COVERAGE.md", "coverage", "Coverage map"),
    ("SCALING.md", "scaling", "Weak scaling"),
]

PAGE_TEMPLATE = jinja2.Template(
    """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{{ title }} — genjax_tpu</title>
<link rel="stylesheet" href="{{ root }}style.css">
</head>
<body>
<nav class="sidebar">
<p class="brand"><a href="{{ root }}index.html">genjax_tpu</a></p>
{% for section, items in nav %}
<p class="section">{{ section }}</p>
<ul>
{% for href, label in items %}
<li{% if href == self_href %} class="current"{% endif %}>
<a href="{{ root }}{{ href }}">{{ label }}</a></li>
{% endfor %}
</ul>
{% endfor %}
</nav>
<main>
{{ body }}
</main>
</body>
</html>
"""
)

STYLE = """
body { margin: 0; display: flex; font-family: -apple-system, "Segoe UI",
       Helvetica, Arial, sans-serif; color: #1c1e21; }
.sidebar { width: 240px; min-width: 240px; min-height: 100vh;
           background: #f6f8fa; border-right: 1px solid #d8dee4;
           padding: 1rem; box-sizing: border-box; }
.sidebar .brand { font-size: 1.15rem; font-weight: 700; }
.sidebar .section { margin: 1rem 0 0.25rem; font-size: 0.78rem;
                    text-transform: uppercase; color: #57606a; }
.sidebar ul { list-style: none; margin: 0; padding: 0; }
.sidebar li { margin: 0.15rem 0; font-size: 0.9rem; }
.sidebar li.current > a { font-weight: 700; }
.sidebar a { color: #0969da; text-decoration: none; }
main { padding: 1.5rem 3rem; max-width: 60rem; box-sizing: border-box; }
main img { max-width: 100%; }
pre { background: #f6f8fa; padding: 0.8rem; overflow-x: auto;
      border-radius: 6px; font-size: 0.85rem; }
code { background: #f6f8fa; padding: 0.1rem 0.3rem; border-radius: 4px;
       font-size: 0.9em; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; }
th, td { border: 1px solid #d8dee4; padding: 0.35rem 0.6rem;
         font-size: 0.9rem; }
th { background: #f6f8fa; }
h1, h2, h3 { line-height: 1.25; }
a { color: #0969da; }
"""

_HREF = re.compile(r'href="([^"]+)"')


def _link_map(example_stems):
    """old relative target -> new site-relative target (from site root)."""
    m = {}
    for src, stem, _ in GUIDE_PAGES + PROJECT_PAGES:
        name = pathlib.Path(src).name
        for prefix in ("", "../", "docs/", "../docs/"):
            m[prefix + name] = f"{stem}.html"
        m[src] = f"{stem}.html"
    for stem in example_stems:
        for prefix in ("examples/", "../examples/"):
            m[prefix + stem + ".py"] = f"examples/{stem}.html"
    for d in ("examples", "examples/", "../examples", "../examples/"):
        m[d] = "examples/index.html"
    return m


def _rewrite_links(html, link_map, *, depth, page_name, broken):
    """Rewrite internal hrefs through ``link_map``; collect misses."""

    def sub(match):
        target = match.group(1)
        if target.startswith(("http://", "https://", "mailto:", "#")):
            return match.group(0)
        base, _, frag = target.partition("#")
        if base in link_map:
            new = "../" * depth + link_map[base]
            return f'href="{new}{"#" + frag if frag else ""}"'
        if base.endswith(".html") or not base:
            return match.group(0)
        broken.append(f"{page_name}: {target}")
        return match.group(0)

    return _HREF.sub(sub, html)


def _render_md(text):
    return markdown.markdown(text, extensions=MD_EXTENSIONS)


def _render_example(path):
    """Cookbook page: module docstring as markdown intro, then the
    highlighted source."""
    src = path.read_text()
    tree = ast.parse(src)
    doc = ast.get_docstring(tree) or ""
    body_src = src
    if doc:
        # drop the docstring literal from the displayed source
        first = tree.body[0]
        lines = src.splitlines(keepends=True)
        body_src = "".join(lines[first.end_lineno:]).lstrip("\n")
    intro = _render_md(doc)
    code = highlight(body_src, PythonLexer(), HtmlFormatter())
    return f"{intro}\n{code}"


def build(out_dir):
    out = pathlib.Path(out_dir)
    (out / "examples").mkdir(parents=True, exist_ok=True)

    examples = sorted((ROOT / "examples").glob("*.py"))
    example_stems = [p.stem for p in examples]
    link_map = _link_map(example_stems)
    broken = []

    nav = [
        (
            "Guide",
            [(f"{stem}.html", title) for _, stem, title in GUIDE_PAGES],
        ),
        (
            "Cookbook",
            [("examples/index.html", "All 23 cookbooks")]
            + [
                (f"examples/{p.stem}.html", p.stem.replace("_", " "))
                for p in examples
            ],
        ),
        (
            "Project",
            [(f"{stem}.html", title) for _, stem, title in PROJECT_PAGES],
        ),
    ]

    def write_page(rel_out, title, body_html, depth):
        html = _rewrite_links(
            body_html, link_map, depth=depth, page_name=rel_out,
            broken=broken,
        )
        page = PAGE_TEMPLATE.render(
            title=title, body=html, nav=nav, root="../" * depth,
            self_href=rel_out,
        )
        (out / rel_out).write_text(page)

    for src, stem, title in GUIDE_PAGES + PROJECT_PAGES:
        write_page(
            f"{stem}.html", title, _render_md((ROOT / src).read_text()),
            depth=0,
        )

    # cookbook gallery index: stem + first docstring line of each example
    rows = []
    for p in examples:
        doc = ast.get_docstring(ast.parse(p.read_text())) or ""
        first = doc.strip().splitlines()[0] if doc.strip() else ""
        rows.append(f"- [{p.stem}]({p.stem}.html) — {first}")
    gallery_md = (
        "# Cookbook\n\nEvery page below is an assertion-checked script "
        "run in CI (`tests/test_examples.py`) — the executable "
        "counterpart of the reference's notebook gallery.\n\n"
        + "\n".join(rows)
    )
    write_page(
        "examples/index.html", "Cookbook", _render_md(gallery_md), depth=1
    )

    for p in examples:
        write_page(
            f"examples/{p.stem}.html", p.stem, _render_example(p), depth=1
        )

    (out / "style.css").write_text(
        STYLE + HtmlFormatter().get_style_defs(".codehilite, .highlight")
    )

    if broken:
        raise SystemExit(
            "broken internal links:\n  " + "\n  ".join(sorted(set(broken)))
        )
    n_pages = len(GUIDE_PAGES) + len(PROJECT_PAGES) + len(examples) + 1
    print(f"wrote {n_pages} pages to {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(ROOT / "site"))
    args = ap.parse_args()
    build(args.out)


if __name__ == "__main__":
    main()

"""The documentation site builds and every internal link resolves.

Counterpart of the reference's mkdocs deliverable (reference
mkdocs.yml:1): mkdocs is not in this image, so `scripts/build_docs_site.py`
produces the linked, navigable static site and this test is the CI gate —
it builds the full site into a tmpdir and walks every href/src of every
generated page.
"""

import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
_REF = re.compile(r'(?:href|src)="([^"]+)"')


def test_site_builds_and_links_resolve(tmp_path):
    out = tmp_path / "site"
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "build_docs_site.py"),
         "--out", str(out)],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    pages = sorted(out.rglob("*.html"))
    n_examples = len(list((ROOT / "examples").glob("*.py")))
    # 6 guide + 4 project + gallery index + every cookbook
    assert len(pages) == 11 + n_examples

    checked = 0
    for page in pages:
        html = page.read_text()
        # a nav sidebar on every page
        assert 'class="sidebar"' in html, page
        for target in _REF.findall(html):
            if target.startswith(("http://", "https://", "mailto:", "#")):
                continue
            base = target.partition("#")[0]
            resolved = (page.parent / base).resolve()
            assert resolved.exists(), f"{page.name} -> {target}"
            checked += 1
    assert checked > 100  # the site is actually interlinked


def test_api_reference_is_fresh(tmp_path):
    """docs/api.md regenerates byte-identical — the committed API page
    cannot drift from the package (reference: mkdocs gen-files autogen).
    Regenerates into a tmp file so the working tree is never touched
    (xdist workers share it)."""
    committed = (ROOT / "docs" / "api.md").read_text()
    out = tmp_path / "api.md"
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "gen_api_docs.py"),
         "--out", str(out)],
        capture_output=True, text=True, cwd=str(ROOT),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert out.read_text() == committed, (
        "docs/api.md is stale — run python scripts/gen_api_docs.py"
    )

"""Docs-integrity gate — the in-image stand-in for ``mkdocs build --strict``
(CI runs the real strict build, .github/workflows/docs.yml; the reference
gates docs in its own workflow, reference .github/workflows/docs.yml).
A strict mkdocs build fails on nav entries pointing at missing files and
on unresolvable internal links; both are checked here without mkdocs.
"""

import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DOCS = REPO / "docs"


def _nav_paths():
    """Extract the .md paths from mkdocs.yml's nav section (the file is
    simple enough that a yaml dependency isn't needed)."""
    text = (REPO / "mkdocs.yml").read_text()
    nav = text[text.index("\nnav:"):]
    return re.findall(r"[\w./-]+\.md", nav)


def test_mkdocs_config_exists():
    assert (REPO / "mkdocs.yml").is_file()


def test_nav_entries_resolve():
    paths = _nav_paths()
    assert paths, "mkdocs.yml nav parsed empty"
    missing = [p for p in paths if not (DOCS / p).is_file()]
    assert not missing, f"mkdocs.yml nav points at missing files: {missing}"


def test_all_docs_pages_are_in_nav():
    """--strict warns (fails) on pages not included in nav."""
    in_nav = set(_nav_paths())
    on_disk = {
        p.relative_to(DOCS).as_posix() for p in DOCS.rglob("*.md")
    }
    orphans = on_disk - in_nav
    assert not orphans, f"docs pages missing from mkdocs.yml nav: {orphans}"


def test_internal_links_resolve():
    """Relative .md links between docs pages must point at real files
    (mkdocs --strict fails on broken internal links)."""
    broken = []
    for page in DOCS.rglob("*.md"):
        for match in re.finditer(r"\]\(([^)#\s]+\.md)(#[^)]*)?\)", page.read_text()):
            target = match.group(1)
            if target.startswith(("http://", "https://")):
                continue
            if not (page.parent / target).resolve().is_file():
                broken.append(f"{page.relative_to(REPO)} -> {target}")
    assert not broken, f"broken internal doc links: {broken}"


def test_heading_anchors_resolve():
    """Internal links with #anchors must target a real heading slug."""

    def slugs(md_path):
        out = set()
        for line in md_path.read_text().splitlines():
            m = re.match(r"#+\s+(.*)", line)
            if m:
                title = re.sub(r"[`*_]", "", m.group(1)).strip()
                slug = re.sub(r"[^\w\s-]", "", title.lower())
                out.add(re.sub(r"[\s]+", "-", slug).strip("-"))
        return out

    broken = []
    for page in DOCS.rglob("*.md"):
        for match in re.finditer(r"\]\(([^)#\s]*\.md)#([^)]+)\)", page.read_text()):
            target, anchor = match.groups()
            target_path = (page.parent / target).resolve()
            if not target_path.is_file():
                continue  # covered by test_internal_links_resolve
            if anchor not in slugs(target_path):
                broken.append(
                    f"{page.relative_to(REPO)} -> {target}#{anchor}"
                )
    assert not broken, f"broken heading anchors: {broken}"

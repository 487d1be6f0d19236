"""docs/API.md must stay in sync with the package: every non-CLI module
is mentioned by name (CLI entry points are covered collectively by the
README "CLI" section, which API.md defers to)."""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _package_modules():
    modules = []
    package_root = os.path.join(REPO, "lecturemath_tpu")
    for root, dirs, files in os.walk(package_root):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for name in sorted(files):
            if not name.endswith(".py") or name == "__init__.py":
                continue
            rel = os.path.relpath(os.path.join(root, name), package_root)
            modules.append(rel[:-3].replace(os.sep, "."))
    return modules


def test_every_module_is_documented():
    doc = open(os.path.join(REPO, "docs", "API.md")).read()
    readme = open(os.path.join(REPO, "README.md")).read()
    missing = []
    for module in _package_modules():
        short = module.rsplit(".", 1)[-1]
        if module.startswith("cli."):
            # CLI modules: README's CLI section is the canonical list
            if short not in readme:
                missing.append(f"{module} (not in README CLI section)")
        elif module not in doc and short not in doc:
            missing.append(f"{module} (not in docs/API.md)")
    assert not missing, "undocumented modules:\n" + "\n".join(missing)


def test_api_doc_mentions_no_phantom_modules():
    """Module names cited in API.md's first column must exist (catches
    renames that orphan the doc)."""
    doc = open(os.path.join(REPO, "docs", "API.md")).read()
    cited = set(re.findall(r"^\| `((?:\w+\.)+\w+)`", doc, re.M))
    existing = set(_package_modules())
    phantom = cited - existing
    assert not phantom, f"API.md cites nonexistent modules: {phantom}"

"""Every repo path cited in docs/*.md and README.md must exist.

VERDICT r4 item 1: docs/METRICS.md shipped citing an artifact
(docs/metric_bounds_1000.json) that was never committed.  This guard makes
a dangling repo-path reference a test failure.

Scope: only paths under the repo's own top-level trees (docs/, tools/,
tests/, subgc_tpu/, examples/, native/) plus repo-root files explicitly
named with an extension.  Reference-repo citations (misc/..., models/...,
dataloaders/... — they resolve under /root/reference) and illustrative
output paths (/tmp/..., eval_results/...) are out of scope by
construction of the prefix list.
"""
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# repo-owned path prefixes: a cited path starting with one of these must
# exist in the working tree
_PREFIXES = ("docs/", "tools/", "tests/", "subgc_tpu/", "examples/",
             "native/")
# repo-root files commonly cited bare
_ROOT_FILES = ("bench.py", "train.sh", "test.sh", "__graft_entry__.py",
               "pyproject.toml", "SURVEY.md", "BASELINE.md", "README.md")

_PATH_RE = re.compile(
    r"(?<![\w/])((?:%s)[\w./-]+|%s)" % (
        "|".join(re.escape(p) for p in _PREFIXES),
        "|".join(re.escape(f) for f in _ROOT_FILES)))

# names that look like repo paths but are prose artifacts (e.g. shell
# redirection targets or planned-not-promised files).  Keep EMPTY unless a
# doc legitimately needs to mention a path that must not exist.
_ALLOWED_MISSING: set = set()


def _cited_paths():
    docs = [os.path.join(REPO, "README.md")]
    ddir = os.path.join(REPO, "docs")
    docs += [os.path.join(ddir, f) for f in sorted(os.listdir(ddir))
             if f.endswith(".md")]
    out = []
    for doc in docs:
        with open(doc, encoding="utf-8") as f:
            text = f.read()
        for m in _PATH_RE.finditer(text):
            p = m.group(1)
            # strip :line / :line-range citations and trailing punctuation
            p = re.sub(r":[\d,:-]+$", "", p)
            p = p.rstrip(".,;:)]}`'\"")
            # a cited directory may be written with a trailing slash
            out.append((os.path.relpath(doc, REPO), p))
    assert out, "path scraper found nothing — regex broke"
    return out


@pytest.mark.parametrize("doc,path", sorted(set(_cited_paths())))
def test_cited_path_exists(doc, path):
    if path in _ALLOWED_MISSING:
        pytest.skip("explicitly allowed missing")
    full = os.path.join(REPO, path)
    assert os.path.exists(full), (
        f"{doc} cites {path!r} which does not exist in the repo — either "
        f"commit the artifact or fix the citation")

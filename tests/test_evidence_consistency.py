"""Docs-vs-evidence consistency guards (VERDICT r4 weak 1/2).

Round 4's two documentation failures were (a) a ROADMAP that claimed
artifacts that did not exist in the tree and (b) a README recommendation
contradicted by the committed decision metric.  These tests make both
failure classes impossible to commit silently: every artifact path cited
as existing evidence must exist, and the shipped default setup must be the
argmax of the committed ``ess_per_wall_second`` data.
"""
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_recommended_setup_matches_quality_artifact():
    """The CLI/default recommendation must be the configuration that
    measurably wins on ess_per_wall_second (VERDICT r4 items 4/6)."""
    path = os.path.join(REPO, "artifacts", "quality_femur.json")
    with open(path) as f:
        d = json.load(f)
    assert "recommended_by_ess_per_wall_second" in d, (
        "quality artifact must state the decision metric's argmax"
    )
    from icp_proposal_tpu.apps.femur import RECOMMENDED_SETUP

    measured = d["recommended_by_ess_per_wall_second"]
    assert RECOMMENDED_SETUP == measured, (
        f"shipped default {RECOMMENDED_SETUP!r} contradicts the committed "
        f"decision data (argmax of ess_per_wall_second = {measured!r}); "
        "update RECOMMENDED_SETUP (and README/docs) or re-measure"
    )


ARTIFACT_RE = re.compile(r"`?(artifacts/[A-Za-z0-9_/.-]+\.(?:jsonl|json|npz))`?")


@pytest.mark.parametrize("doc", ["ROADMAP.md", "README.md", "docs/MIXING.md"])
def test_cited_artifact_paths_exist(doc):
    """Every artifact path a committed doc cites as evidence must exist in
    the tree — EXCEPT paths in sections explicitly marked as in-progress /
    gaps (ROADMAP's 'In progress' and 'Known gaps' sections)."""
    path = os.path.join(REPO, doc)
    with open(path) as f:
        text = f.read()
    # drop explicitly-not-yet-evidence sections
    for marker in ("## In progress", "## Known gaps"):
        idx = text.find(marker)
        if idx != -1:
            nxt = text.find("\n## ", idx + 1)
            text = text[:idx] + (text[nxt:] if nxt != -1 else "")
    missing = sorted(
        {
            m
            for m in ARTIFACT_RE.findall(text)
            if not os.path.exists(os.path.join(REPO, m))
        }
    )
    assert not missing, (
        f"{doc} cites artifact paths that do not exist in the tree: "
        f"{missing} — either produce them or move the claim to an "
        "in-progress/gaps section (VERDICT r4 weak 1)"
    )

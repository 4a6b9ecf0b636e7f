"""Mechanical certified-name overwrite guard (VERDICT r13 #3).

The round-13 near-miss — a fresh Write silently replacing the
r08-certified ``st_cms_stream`` with a weaker reimplementation — was
caught by eye. This test makes it mechanical: ``docs/IMPL_MANIFEST.json``
snapshots every driver-certified name's implementing module, qualname,
source hash, and oracle hash; any drift fails here until the manifest is
regenerated (``python tools/gen_impl_manifest.py --write``) in the same
commit, turning a silent overwrite into an explicit reviewable diff.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from gen_impl_manifest import MANIFEST_PATH, build_manifest, manifest_diff


@pytest.fixture(scope="module")
def current() -> dict:
    return build_manifest()


def test_manifest_exists_and_clean(current: dict) -> None:
    assert os.path.exists(MANIFEST_PATH), (
        "docs/IMPL_MANIFEST.json missing — run "
        "`python tools/gen_impl_manifest.py --write`"
    )
    recorded = json.load(open(MANIFEST_PATH))
    problems = manifest_diff(recorded, current)
    assert not problems, (
        "certified implementation drift (overwrite guard):\n"
        + "\n".join(problems)
        + "\nIf intentional, regenerate the manifest in the SAME commit: "
        "python tools/gen_impl_manifest.py --write"
    )


def test_guard_fires_on_simulated_overwrite(current: dict) -> None:
    """Red arm: replaying the r13 near-miss in miniature must be caught.

    st_cms_stream's entry gets a perturbed source hash (what a body
    rewrite produces), a second name gets a module move, a third is
    dropped from the registry view — all three must surface; restoring
    the true state must go green again."""
    recorded = json.load(open(MANIFEST_PATH))
    names = sorted(current)
    victim = "st_cms_stream" if "st_cms_stream" in current else names[0]
    mover, dropped = names[1], names[2]

    tampered = {k: dict(v) for k, v in current.items()}
    tampered[victim]["src_sha"] = "deadbeefdeadbeef"
    tampered[mover]["module"] = "big_data_training_spark.somewhere.else"
    tampered[dropped] = {"missing": True}

    problems = manifest_diff(recorded, tampered)
    assert any(victim in p and "src_sha" in p for p in problems)
    assert any(mover in p and "module" in p for p in problems)
    assert any(dropped in p and "NOT registered" in p for p in problems)

    # Green arm: the untampered state matches the committed manifest.
    assert manifest_diff(recorded, current) == []


def test_guard_fires_on_stale_manifest(current: dict) -> None:
    """A name certified after the manifest was last regenerated (or one
    that left the certified set) must demand a regen, not pass quietly."""
    recorded = json.load(open(MANIFEST_PATH))
    extra = dict(current)
    extra["brand_new_certified_name"] = {
        "module": "m", "qualname": "q", "src_sha": "s", "oracle_sha": None,
    }
    assert any(
        "absent from the manifest" in p for p in manifest_diff(recorded, extra)
    )
    shrunk = {k: v for k, v in current.items() if k != sorted(current)[0]}
    assert any(
        "no longer driver-certified" in p
        for p in manifest_diff(recorded, shrunk)
    )

"""Certified-implementation manifest: the mechanical overwrite guard
(VERDICT r13 #3).

Round-13 near-miss: a "new" streaming module Write silently OVERWROTE the
r08-certified ``st_cms_stream`` with a weaker single-batch variant — caught
by eye (git showed ``M`` not ``A``), not by machine. This tool snapshots,
for every driver-certified query name, WHERE its implementation lives
(module + qualname) and WHAT it is (a normalized sha256 of the registered
function's source and of its oracle SQL) into ``docs/IMPL_MANIFEST.json``.
``tests/test_impl_manifest.py`` fails whenever a certified name's recorded
implementation differs from the manifest, so an overwrite (or a silent
deregistration) cannot land unless the manifest is regenerated in the same
commit — an explicit, reviewable act instead of a silent replacement.

Usage:
    python tools/gen_impl_manifest.py            # diff only (exit 1 on drift)
    python tools/gen_impl_manifest.py --write    # regenerate the manifest

Scope note: the hash covers the registered function's own source. A change
inside a helper it calls is invisible here — that is the (covered) job of
the oracle gate and the re-certification rotation; THIS guard targets the
specific failure of the registered entry point itself being replaced.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MANIFEST_PATH = os.path.join(REPO, "docs", "IMPL_MANIFEST.json")


def _norm_sha(text: str) -> str:
    """sha256 (16 hex) over dedented, rstripped lines — whitespace-only
    reflows don't churn the manifest; any token change does."""
    import hashlib
    import textwrap

    lines = [ln.rstrip() for ln in textwrap.dedent(text).splitlines()]
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def build_manifest() -> dict[str, dict]:
    import inspect

    from big_data_training_spark.registry import _DRIVER_CERTIFIED, all_queries

    specs = all_queries()
    out: dict[str, dict] = {}
    for name in sorted(_DRIVER_CERTIFIED):
        spec = specs.get(name)
        if spec is None:
            # Recorded so the diff (and the pytest) flags the
            # deregistration instead of silently shrinking the manifest.
            out[name] = {"missing": True}
            continue
        out[name] = {
            "module": spec.fn.__module__,
            "qualname": spec.fn.__qualname__,
            "src_sha": _norm_sha(inspect.getsource(spec.fn)),
            "oracle_sha": _norm_sha(spec.oracle) if spec.oracle else None,
        }
    return out


def manifest_diff(recorded: dict[str, dict], current: dict[str, dict]) -> list[str]:
    """Human-readable violations between the committed manifest and the
    registry's current state. Pure function so the pytest can exercise
    both the red (simulated overwrite) and green (restore) arms."""
    problems: list[str] = []
    for name, cur in current.items():
        if cur.get("missing"):
            problems.append(f"{name}: certified name is NOT registered any more")
            continue
        rec = recorded.get(name)
        if rec is None:
            problems.append(
                f"{name}: certified but absent from the manifest "
                "(regenerate after folding new certificates)"
            )
            continue
        for key in ("module", "qualname", "src_sha", "oracle_sha"):
            if rec.get(key) != cur.get(key):
                problems.append(
                    f"{name}: {key} changed "
                    f"({rec.get(key)!r} -> {cur.get(key)!r})"
                )
    for name in recorded:
        if name not in current:
            problems.append(
                f"{name}: in the manifest but no longer driver-certified "
                "(manifest stale — regenerate)"
            )
    return problems


def main() -> None:
    current = build_manifest()
    if "--write" in sys.argv:
        with open(MANIFEST_PATH, "w") as fh:
            json.dump(current, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {MANIFEST_PATH} ({len(current)} certified names)")
        return
    if not os.path.exists(MANIFEST_PATH):
        sys.exit(f"{MANIFEST_PATH} missing — run with --write")
    recorded = json.load(open(MANIFEST_PATH))
    problems = manifest_diff(recorded, current)
    if problems:
        print("\n".join(problems))
        sys.exit(
            f"\n{len(problems)} certified-implementation drift(s). If every "
            "change above is INTENTIONAL, regenerate with "
            "`python tools/gen_impl_manifest.py --write` in the SAME commit."
        )
    print(f"manifest clean ({len(current)} certified names)")


if __name__ == "__main__":
    main()

"""Compare two bench records with the environment normalized out.

Raw cross-round medians drift 1.4-4x on load/clock changes (measured:
round 6→7 drifted a uniform 1.4x on untouched code; a loaded-container
round-9 run showed mm_binaryfile_ingest 2.5x faster than the clean
record purely from page cache). Every record carries `env.cal_sec` —
the median runtime of a fixed data-independent codegen kernel in the
SAME session — so this tool reports each query's delta both raw and
net of the cal ratio, and flags only the net movers. A flagged mover
still needs an interleaved old-vs-new A/B in ONE session before it is
claimed as a regression or a win; this tool tells you where to look.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    # consume --threshold's VALUE token too, so the documented
    # space-separated form `--threshold 1.3` does not land the value in
    # the positional list and trip the usage exit
    argv = sys.argv[1:]
    args: list[str] = []
    thr = 1.3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--threshold" or a.startswith("--threshold="):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                thr = float(argv[i])
            else:
                sys.exit(__doc__)
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))

    def _cal_mid(rec: dict, key: str) -> float | None:
        env = rec.get("env") or {}
        start, end = env.get(key), env.get(f"{key}_end")
        if start is None:
            return None
        return (start + end) / 2 if end is not None else start

    cal_o = _cal_mid(old, "cal_sec")
    cal_n = _cal_mid(new, "cal_sec")
    cal_ratio = (cal_n / cal_o) if cal_o and cal_n else 1.0
    qo, qn = old["queries"], new["queries"]
    shared = sorted(set(qo) & set(qn))
    so, sn = sum(qo[q] for q in shared), sum(qn[q] for q in shared)
    print(
        f"shared={len(shared)} total {so:.1f}s -> {sn:.1f}s ="
        f" {sn / so:.2f}x raw, {sn / so / cal_ratio:.2f}x net of cal"
        f" (cal mid {cal_o} -> {cal_n}, ratio {cal_ratio:.2f})"
    )
    # Second axis (round 13+): records carrying the shuffle-bound kernel
    # expose contention-shaped ambient load the CPU kernel misses —
    # streaming/trigger-bound and iterative-graph movers should be read
    # against THIS ratio, not the CPU one.
    shuf_o = _cal_mid(old, "cal_shuffle_sec")
    shuf_n = _cal_mid(new, "cal_shuffle_sec")
    if shuf_o and shuf_n:
        print(
            f"shuffle axis: cal mid {shuf_o:.3f} -> {shuf_n:.3f}, ratio"
            f" {shuf_n / shuf_o:.2f} — read streaming/trigger-bound and"
            f" iterative-graph movers against this axis"
        )
    elif shuf_n or shuf_o:
        print(
            "shuffle axis: only one record carries cal_shuffle_sec —"
            " streaming-row deltas are not load-attributable across"
            " this pair"
        )
    # Third axis (round 14+): per-trigger scheduling latency. The driver's
    # r13 record ran its st_* rows 1.6-2.2x inflated while BOTH axes above
    # read at-norm — trigger-bound contention is invisible to a codegen
    # fold and to one batch shuffle. When both records carry the trigger
    # kernel, st_*/w6 rows are normalized against THIS ratio instead of
    # the CPU one.
    trig_o = _cal_mid(old, "cal_trigger_sec")
    trig_n = _cal_mid(new, "cal_trigger_sec")
    trig_ratio = None
    if trig_o and trig_n:
        trig_ratio = trig_n / trig_o
        print(
            f"trigger axis: cal mid {trig_o:.3f} -> {trig_n:.3f}, ratio"
            f" {trig_ratio:.2f} — st_*/w6 rows below are normalized"
            " against this axis"
        )
    elif trig_n or trig_o:
        print(
            "trigger axis: only one record carries cal_trigger_sec —"
            " st_*/w6 deltas are normalized by the CPU axis only and may"
            " be trigger-latency drift, not code"
        )

    def _is_trigger_bound(q: str) -> bool:
        return q.startswith("st_") or q.startswith("w6")

    movers = []
    for q in shared:
        raw = qn[q] / max(qo[q], 1e-9)
        axis = (
            trig_ratio
            if trig_ratio is not None and _is_trigger_bound(q)
            else cal_ratio
        )
        net = raw / axis
        if net >= thr or net <= 1 / thr:
            movers.append((net, raw, q))
    movers.sort(reverse=True)
    if not movers:
        print(f"no query moved beyond {thr}x net of its axis")
        return
    print(f"\nnet movers beyond {thr}x (verify with an interleaved A/B):")
    print("|    net |    raw | query | old s | new s | old spread | new spread |")
    for net, raw, q in movers:
        sp_o = (old.get("spread") or {}).get(q, "")
        sp_n = (new.get("spread") or {}).get(q, "")
        axis_tag = (
            " [trigger-axis]"
            if trig_ratio is not None and _is_trigger_bound(q)
            else ""
        )
        print(
            f"| {net:6.2f} | {raw:6.2f} | {q}{axis_tag} | {qo[q]} | {qn[q]} |"
            f" {sp_o} | {sp_n} |"
        )


if __name__ == "__main__":
    main()

"""Refresh ORACLE_HASHES.json — the fixture-change ledger for rotation.

The registry orders the driver's per-round verification budget by the
ROUND of each query's newest hash-green CORRECTNESS row, stalest first.
That rotation keys on row AGE alone, so a query whose oracle (or
fixture formula, which lives in the oracle SQL) changed AFTER its
newest green row would look stably verified. This tool maintains the
ledger that closes the gap: for every registered query it records the
sha256 fingerprint of its verification surface (oracle SQL, else the
callable's source) and the round that fingerprint took effect. The
registry invalidates green evidence older than `since` or whose hash
no longer matches, sorting those queries back to the front.

Run AFTER changing any oracle/fixture (and before committing):

    python tools/update_oracle_hashes.py            # since = newest CORRECTNESS round + 1
    python tools/update_oracle_hashes.py --round N  # explicit upcoming round
    python tools/update_oracle_hashes.py --bootstrap-since 1  # first-ever snapshot
    python tools/update_oracle_hashes.py --touch q1 q2  # force re-verification

SCOPE: the fingerprint covers the VERIFICATION SURFACE (oracle SQL —
which embeds the fixture formulas — or the query callable for
rows-only queries). It does NOT cover the operator/decoder source the
query exercises: a decoder rewrite that leaves every oracle unchanged
is invisible to the hash. That class of change is covered by the unit
suites, and whoever rewrites a shared decode path must ALSO run
`--touch` on the already-green queries that exercise it, bumping their
`since` so the driver re-verifies them end-to-end (r13 did this for
the four JPEG-path queries after the sampling-gate/lossless rework).

`tests/test_registry_parity.py::test_oracle_hash_snapshot_fresh` fails
when a registered query's live fingerprint differs from the ledger —
i.e. when someone changed an oracle without running this tool.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(ROOT, "ORACLE_HASHES.json")


def newest_correctness_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, default=None,
                    help="round changed entries take effect (default: newest CORRECTNESS round + 1)")
    ap.add_argument("--bootstrap-since", type=int, default=None,
                    help="'since' for entries NEW to the ledger (first snapshot only)")
    ap.add_argument("--touch", nargs="*", default=[],
                    help="queries to force-bump to the upcoming round even though "
                         "their fingerprint is unchanged (use after rewriting a "
                         "shared operator/decoder path they exercise)")
    args = ap.parse_args(argv)

    sys.path.insert(0, ROOT)
    from financedatabase_spark.plans import registry

    next_round = args.round if args.round is not None else newest_correctness_round() + 1

    try:
        with open(LEDGER) as f:
            hashes: dict[str, dict] = json.load(f).get("hashes", {})
    except (OSError, ValueError):
        hashes = {}

    unknown = sorted(set(args.touch) - set(registry.QUERIES))
    if unknown:
        raise SystemExit(f"--touch names not in the registry: {unknown}")

    changed, added, touched = [], [], []
    out: dict[str, dict] = {}
    for name in sorted(registry.QUERIES):
        fp = registry.oracle_fingerprint(name)
        prev = hashes.get(name)
        if prev is None:
            since = args.bootstrap_since if args.bootstrap_since is not None else next_round
            out[name] = {"hash": fp, "since": since}
            added.append(name)
        elif prev.get("hash") != fp:
            out[name] = {"hash": fp, "since": next_round}
            changed.append(name)
        elif name in args.touch:
            out[name] = {"hash": fp, "since": next_round}
            touched.append(name)
        else:
            out[name] = prev
    dropped = sorted(set(hashes) - set(out))

    with open(LEDGER, "w") as f:
        json.dump({"round": next_round, "hashes": out}, f, indent=1, sort_keys=True)
        f.write("\n")

    print(f"round={next_round} entries={len(out)} "
          f"added={len(added)} changed={len(changed)} "
          f"touched={len(touched)} dropped={len(dropped)}")
    for label, names in (
        ("added", added), ("changed", changed),
        ("touched", touched), ("dropped", dropped),
    ):
        for n in names:
            print(f"  {label}: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

#!/usr/bin/env python3
"""Fold CORRECTNESS_r*.json driver evidence into ledger tables.

Reads every CORRECTNESS_r*.json in the repo root and prints the
per-round evidence dicts (`_HASH_GREEN_BY_ROUND` / `_ROWS_SEEN_BY_ROUND`
bodies) for tmp_parquet_merge_spark/queries.py — each query listed
under the LATEST round that evidenced it, hash-pass and rows-only kept
separate, names the registry no longer knows flagged loudly.

Usage: python tools/fold_evidence.py [--evidence-dir DIR] [--markdown]
(diagnostic NOTE/WARNING lines go to stderr so --markdown output pipes
clean into EVIDENCE.md)

``--markdown`` emits the cumulative EVIDENCE.md table instead (r13
verdict #8): one row per registered query — latest evidence round,
evidence kind, staleness histogram at the top — so any reader can
verify the coverage claim without re-folding the CORRECTNESS files.
(cwd-independent; DIR defaults to the repo root — tests point it at a
synthesized fixture dir so assertions never depend on which live
CORRECTNESS artifacts happen to exist at HEAD)

The output is a starting point for the next round's ledger update; the
curator still subtracts names whose code changed after their evidence
round (those belong in _CHANGED_THIS_ROUND or simply drop out).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

# anchor everything to the repo root (this file's parent dir): a
# cwd-relative glob run from anywhere else would silently find ZERO
# evidence files and print an empty ledger — which, pasted into
# queries.py, wipes the whole evidence table.
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    evidence_dir = ROOT
    markdown = "--markdown" in args
    if markdown:
        args.remove("--markdown")
    if "--evidence-dir" in args:
        i = args.index("--evidence-dir")
        try:
            evidence_dir = args[i + 1]
        except IndexError:
            print("usage: fold_evidence.py [--evidence-dir DIR]", file=sys.stderr)
            return 2
        del args[i : i + 2]
    if args:
        print(f"# ERROR: unknown args {args}", file=sys.stderr)
        return 2
    latest_hash: dict[str, int] = {}
    latest_rows: dict[str, int] = {}
    paths = sorted(glob.glob(os.path.join(evidence_dir, "CORRECTNESS_r*.json")))
    if not paths:
        print(
            f"# ERROR: no CORRECTNESS_r*.json under {evidence_dir}",
            file=sys.stderr,
        )
        return 2
    for path in paths:
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.load(open(path))
        for name, row in data.items():
            # track BOTH evidence kinds independently: dropping rows
            # evidence for an already-hash-green name loses the newer
            # round if that query's oracle is later removed (the moved
            # entry then folds in with a stale round number)
            if row.get("hash_match"):
                latest_hash[name] = max(latest_hash.get(name, 0), rnd)
            elif row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0:
                latest_rows[name] = max(latest_rows.get(name, 0), rnd)

    from tmp_parquet_merge_spark.queries import REGISTRY

    unknown = (set(latest_hash) | set(latest_rows)) - set(REGISTRY)
    if unknown:
        print(
            f"# WARNING: evidence for unregistered names: {sorted(unknown)}",
            file=sys.stderr,
        )

    # Evidence tier must match the query's CURRENT oracle status:
    # _driver_tier consults _HASH_GREEN only for oracle-backed queries
    # and _ROWS_SEEN only for oracle-less ones, so a query whose oracle
    # was removed after a hash-green round must fold into the rows
    # table (its hash evidence certifies an oracle that no longer
    # exists), and vice versa a rows-only query that GAINED an oracle
    # must drop its rows evidence and re-queue at tier 0.
    for name in sorted(latest_hash):
        if name in REGISTRY and REGISTRY[name].oracle is None:
            rnd = latest_hash.pop(name)
            latest_rows[name] = max(latest_rows.get(name, 0), rnd)
            print(
                f"# NOTE: {name} hash-green in r{rnd} but now oracle-less"
                " -> moved to rows table",
                file=sys.stderr,
            )
    for name in sorted(latest_rows):
        if name in REGISTRY and REGISTRY[name].oracle is not None:
            rnd = latest_rows.pop(name)
            if name in latest_hash:
                continue  # hash evidence carries the query; rows noise
            print(
                f"# NOTE: {name} rows-only evidence (r{rnd}) but now has an"
                " oracle -> dropped (re-queues at tier 0)",
                file=sys.stderr,
            )
    # a name can hold BOTH kinds of evidence (ran rows-only in one
    # round, hash-matched in another while oracle-backed): the tables
    # must stay disjoint — the oracle-status fixups above already
    # routed each name to the table _driver_tier consults
    overlap = set(latest_hash) & set(latest_rows)
    for name in overlap:
        latest_rows.pop(name)

    def dump(title: str, latest: dict[str, int]) -> None:
        print(f"{title} = {{")
        by_round: dict[int, list[str]] = {}
        for n, r in latest.items():
            by_round.setdefault(r, []).append(n)
        for r in sorted(by_round):
            names = sorted(by_round[r])
            print(f"    {r}: (")
            for n in names:
                print(f'        "{n}",')
            print("    ),")
        print("}")

    if markdown:
        never = [
            n for n in REGISTRY
            if n not in latest_hash and n not in latest_rows
        ]
        hist: dict[int, int] = {}
        for r in list(latest_hash.values()) + list(latest_rows.values()):
            hist[r] = hist.get(r, 0) + 1
        print("# EVIDENCE — cumulative driver-evidence ledger")
        print()
        print(
            "Generated by `python tools/fold_evidence.py --markdown` from "
            "every\nCORRECTNESS_r*.json at HEAD; regenerate at round "
            "close.  One row per\nregistered query: the LATEST round "
            "whose driver run evidenced it, and the\nevidence kind "
            "(hash = oracle value-hash match at sf0.01; rows-only = "
            "ran and\nproduced rows, reserved for queries without a "
            "DuckDB-expressible oracle)."
        )
        print()
        print(
            f"Registered queries: **{len(REGISTRY)}** — "
            f"hash-evidenced {len(latest_hash)}, "
            f"rows-only {len(latest_rows)}, "
            f"never-evidenced {len(never)}"
            + (f" ({sorted(never)})" if never else "")
        )
        print()
        print("Staleness histogram (latest evidence round -> queries):")
        print()
        print("| round | queries |")
        print("|---|---|")
        for r in sorted(hist):
            print(f"| r{r} | {hist[r]} |")
        print()
        print("| query | latest evidence | kind |")
        print("|---|---|---|")
        for n in sorted(REGISTRY):
            if n in latest_hash:
                print(f"| `{n}` | r{latest_hash[n]} | hash |")
            elif n in latest_rows:
                print(f"| `{n}` | r{latest_rows[n]} | rows-only |")
            else:
                print(f"| `{n}` | — | NEVER |")
        return 0

    dump("_HASH_GREEN_BY_ROUND", latest_hash)
    dump("_ROWS_SEEN_BY_ROUND", latest_rows)
    never = [n for n in REGISTRY if n not in latest_hash and n not in latest_rows]
    print(f"# never driver-evidenced ({len(never)}): {never}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

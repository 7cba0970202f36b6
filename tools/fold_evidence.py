#!/usr/bin/env python3
"""Fold CORRECTNESS_r*.json driver evidence into ledger tables.

Reads every CORRECTNESS_r*.json in the repo root and prints the
per-round evidence dicts (`_HASH_GREEN_BY_ROUND` / `_ROWS_SEEN_BY_ROUND`
bodies) for tmp_parquet_merge_spark/queries.py — each query listed
under the LATEST round that evidenced it, hash-pass and rows-only kept
separate, names the registry no longer knows flagged loudly.

Usage: python tools/fold_evidence.py   (run from the repo root)

The output is a starting point for the next round's ledger update; the
curator still subtracts names whose code changed after their evidence
round (those belong in _CHANGED_THIS_ROUND or simply drop out).
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    latest_hash: dict[str, int] = {}
    latest_rows: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.load(open(path))
        for name, row in data.items():
            if row.get("hash_match"):
                latest_hash[name] = max(latest_hash.get(name, 0), rnd)
                latest_rows.pop(name, None)
            elif row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0:
                if name not in latest_hash:
                    latest_rows[name] = max(latest_rows.get(name, 0), rnd)

    from tmp_parquet_merge_spark.queries import REGISTRY

    unknown = (set(latest_hash) | set(latest_rows)) - set(REGISTRY)
    if unknown:
        print(f"# WARNING: evidence for unregistered names: {sorted(unknown)}")

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
                " -> moved to rows table"
            )
    for name in sorted(latest_rows):
        if name in REGISTRY and REGISTRY[name].oracle is not None:
            rnd = latest_rows.pop(name)
            print(
                f"# NOTE: {name} rows-only evidence (r{rnd}) but now has an"
                " oracle -> dropped (re-queues at tier 0)"
            )

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

    dump("_HASH_GREEN_BY_ROUND", latest_hash)
    dump("_ROWS_SEEN_BY_ROUND", latest_rows)
    never = [n for n in REGISTRY if n not in latest_hash and n not in latest_rows]
    print(f"# never driver-evidenced ({len(never)}): {never}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

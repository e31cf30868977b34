"""Selection-rank agreement between two runs (parity: reference
utils/compare_selections.py:4-30) — the de-facto selection-determinism
check named in BASELINE.md. Returns per-round (intersection, total) pairs
in addition to printing, so tests and the bench harness can consume it.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple


def compare_selections(folder_a: str, folder_b: str,
                       verbose: bool = True) -> Dict[str, Tuple[int, int]]:
    list_a = [x for x in os.listdir(folder_a)
              if os.path.isdir(os.path.join(folder_a, x))]
    list_b = [x for x in os.listdir(folder_b)
              if os.path.isdir(os.path.join(folder_b, x))]
    common = sorted(x for x in list_a if x in list_b)

    last_a, last_b = set(), set()
    results = {}
    for f in common:
        with open(os.path.join(folder_a, f, "selections.txt")) as fp:
            selections_a = set(fp.readlines()).difference(last_a)
        with open(os.path.join(folder_b, f, "selections.txt")) as fp:
            selections_b = set(fp.readlines()).difference(last_b)
        last_a = last_a.union(selections_a)
        last_b = last_b.union(selections_b)
        assert len(selections_b) == len(selections_a), \
            f"unequal number of selections in {f}"
        n = len(selections_a.intersection(selections_b))
        results[f] = (n, len(selections_a))
        if verbose:
            pct = n * 100.0 / max(len(selections_a), 1)
            print(f"Number of common elements in {f} = "
                  f"{n}/{len(selections_a)} ({pct})")
    return results


if __name__ == "__main__":
    import sys

    compare_selections(sys.argv[1], sys.argv[2])

"""Assemble SCALE_SMOKE_r{N}.json from the individual smoke outputs.

Usage: python scripts/assemble_scale_smoke.py <out.json> <f10.json> <f100.json> \
           <retrieval.json> <snapshot.json> [notes.json]

Each input is the ONE-line JSON the respective script prints
(scale_smoke.py 10 / 100, retrieval_smoke.py, snapshot_smoke.py);
notes.json is an optional dict merged in verbatim.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        # take the last line that parses as JSON (scripts may log above it)
        out = None
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    out = json.loads(line)
                except json.JSONDecodeError:
                    continue
        if out is None:
            raise SystemExit(f"no JSON line in {path}")
        return out


def main() -> int:
    out_path, f10, f100, retr, snap = sys.argv[1:6]
    doc = {
        "metric": "scale_smoke",
        "runs": [_load(f10), _load(f100)],
        "retrieval_lifecycle": _load(retr),
        "snapshot_lifecycle": _load(snap),
    }
    if len(sys.argv) > 6:
        doc.update(json.load(open(sys.argv[6])))
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Merge per-sampler convergence artifacts into TRAINRUN_r05.json.

The round-5 convergence evidence was produced in several TPU sessions
(the tunnel hung once and a host kill ended another mid-run); this
merges whatever per-sampler JSONs exist plus log-recovered fragments
into the single checked-in artifact.
"""

import glob
import json
import sys

OUT = "TRAINRUN_r05.json"


def main(paths):
    merged = None
    for path in paths:
        with open(path) as f:
            d = json.load(f)
        if merged is None and "task" in d:
            merged = d
            continue
        if merged is None:
            merged = {"runs": {}}
        for k, v in d.get("runs", {}).items():
            if k in merged["runs"]:
                # prefer the run with more epochs recorded
                if len(v.get("epochs", [])) <= len(
                        merged["runs"][k].get("epochs", [])):
                    continue
            merged["runs"][k] = v
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({k: {"best_val_acc": v.get("best_val_acc"),
                          "epochs": len(v.get("epochs", []))}
                      for k, v in merged["runs"].items()}, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:] or sorted(glob.glob("TRAINRUN_r05*.json")))

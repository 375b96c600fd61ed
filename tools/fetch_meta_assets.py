#!/usr/bin/env python
"""Fetch + validate the GQA meta-info assets into a local directory.

The framework needs eight small public metadata files at
``--meta_dir`` (``ISUBGVQA_META_DIR``) for real-GQA runs — the
scene-graph vocabulary sources and the 1842-answer maps the upstream
project ships under ``ISubGVQA/meta_info`` (reference
``datasets/scene_graph.py:146-197``, ``datasets/gqa.py:95-103``).
They are dataset metadata, not code, so this repo does not bundle
them; this tool copies them out of any upstream checkout (or any
directory holding them) and verifies their integrity so a run fails
loudly at fetch time instead of deep inside vocab construction:

    python tools/fetch_meta_assets.py --src /path/to/ISubGVQA/meta_info \
        --dst ./meta_info
    ISUBGVQA_META_DIR=./meta_info python main.py ...

Checks performed:
* all eight files present,
* txt vocab lists are non-empty, one token per line,
* json lists/dicts parse and have the entry counts the reference
  documents (1703 names / 618 attrs / 311 rels / 600 objects /
  121 predicates / 369 attributes / 1842 answers),
* ans2label <-> label2ans is a bijection (``gqa.py:98-100``).

Count mismatches are warnings (forks may extend the vocab); structural
failures (missing file, non-bijective answer maps) are errors.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

# (filename, kind, documented entry count)
ASSETS = [
    ("name_gqa.txt", "txt", 1703),
    ("attr_gqa.txt", "txt", 618),
    ("rel_gqa.txt", "txt", 311),
    ("objects.json", "json_list", 600),
    ("predicates.json", "json_list", 121),
    ("attributes.json", "json_list", 369),
    ("trainval_ans2label.json", "json_dict", 1842),
    ("trainval_label2ans.json", "json_list", 1842),
]


def validate(dst: str, strict_counts: bool = False) -> list[str]:
    """Returns a list of warnings; raises on structural errors."""
    warnings = []
    for name, kind, want in ASSETS:
        path = os.path.join(dst, name)
        if not os.path.isfile(path):
            raise FileNotFoundError(f"missing asset: {path}")
        if kind == "txt":
            with open(path) as f:
                rows = [r for r in f.read().splitlines() if r.strip()]
            if not rows:
                raise ValueError(f"{name}: empty vocab list")
            n = len(rows)
        else:
            with open(path) as f:
                obj = json.load(f)
            if kind == "json_list" and not isinstance(obj, list):
                raise ValueError(f"{name}: expected a JSON list")
            if kind == "json_dict" and not isinstance(obj, dict):
                raise ValueError(f"{name}: expected a JSON dict")
            n = len(obj)
        if n != want:
            msg = f"{name}: {n} entries (reference documents {want})"
            if strict_counts:
                raise ValueError(msg)
            warnings.append(msg)

    with open(os.path.join(dst, "trainval_ans2label.json")) as f:
        a2l = json.load(f)
    with open(os.path.join(dst, "trainval_label2ans.json")) as f:
        l2a = json.load(f)
    if len(a2l) != len(l2a):
        raise ValueError("answer maps disagree in size")
    for ans, label in a2l.items():
        if not (0 <= label < len(l2a)) or l2a[label] != ans:
            raise ValueError(
                f"answer maps are not a bijection at {ans!r} -> {label}")
    return warnings


def fetch(src: str, dst: str, strict_counts: bool = False) -> list[str]:
    os.makedirs(dst, exist_ok=True)
    for name, _, _ in ASSETS:
        spath = os.path.join(src, name)
        if not os.path.isfile(spath):
            raise FileNotFoundError(
                f"{spath} not found — point --src at a directory holding "
                "the eight meta-info assets (e.g. an upstream checkout's "
                "ISubGVQA/meta_info)")
        shutil.copyfile(spath, os.path.join(dst, name))
    return validate(dst, strict_counts=strict_counts)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--src", required=True,
                    help="directory holding the upstream meta-info files")
    ap.add_argument("--dst", default="./meta_info",
                    help="destination directory (default ./meta_info)")
    ap.add_argument("--validate-only", action="store_true",
                    help="only validate --src, copy nothing")
    ap.add_argument("--strict-counts", action="store_true",
                    help="treat entry-count mismatches as errors")
    args = ap.parse_args(argv)

    if args.validate_only:
        warnings = validate(args.src, strict_counts=args.strict_counts)
        where = args.src
    else:
        warnings = fetch(args.src, args.dst,
                         strict_counts=args.strict_counts)
        where = args.dst
    for w in warnings:
        print(f"warning: {w}", file=sys.stderr)
    print(f"meta-info assets OK at {where} "
          f"({len(ASSETS)} files). Use ISUBGVQA_META_DIR={where} or "
          f"--meta_dir {where}.")
    return 0


if __name__ == "__main__":
    sys.exit(main())

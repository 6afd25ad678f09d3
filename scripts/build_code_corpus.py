"""Assemble a larger byte-LM training corpus from Python sources on disk.

The image has no network egress and no TinyStories-scale natural-language
corpus, but it ships ~10 MB of Python standard-library source — real,
structured, human-written text that a byte-level LM can learn spelling,
indentation grammar, and idioms from.  This script builds a reproducible
train/val/test corpus from it (file-level splits, so evaluation text is
fully held out).

Mirrors the role of the reference's external TinyStories corpus
(reference README.md:384-397 trains on a local .txt); the reference
likewise does not commit its training corpus — only the recipe.

Usage:
    python -m scripts.build_code_corpus [--roots /usr/lib/python3.11]
        [--out data/code_corpus] [--max-mb 64]

Writes train.txt / valid.txt / test.txt under --out (gitignored) plus a
MANIFEST.json recording the file list and sha256s for reproducibility.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os


def collect_files(roots: list[str], suffix: str = ".py") -> list[str]:
    files = []
    for root in roots:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            # skip compiled/test-data noise
            dirnames[:] = [d for d in dirnames if d not in ("__pycache__", "test", "tests", "idle_test")]
            for f in sorted(filenames):
                if f.endswith(suffix):
                    files.append(os.path.join(dirpath, f))
    return files


def read_text(path: str) -> str:
    try:
        with open(path, "r", encoding="utf-8", errors="ignore") as fh:
            return fh.read()
    except OSError:
        return ""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="+", default=["/usr/lib/python3.11"])
    ap.add_argument("--out", default="data/code_corpus")
    ap.add_argument("--max-mb", type=float, default=64.0)
    ap.add_argument("--val-every", type=int, default=37, help="every Nth file -> valid split")
    ap.add_argument("--test-every", type=int, default=41, help="every Nth file -> test split")
    args = ap.parse_args()

    files = collect_files(args.roots)
    os.makedirs(args.out, exist_ok=True)

    splits = {"train": [], "valid": [], "test": []}
    manifest = {"roots": args.roots, "files": {}}
    budget = int(args.max_mb * 1e6)
    total = 0
    for i, path in enumerate(files):
        text = read_text(path)
        if len(text) < 200:  # skip trivial stubs
            continue
        if total + len(text) > budget:
            break
        total += len(text)
        if i % args.test_every == 0:
            split = "test"
        elif i % args.val_every == 0:
            split = "valid"
        else:
            split = "train"
        header = f"\n\n# ==== file: {os.path.basename(path)} ====\n"
        splits[split].append(header + text)
        manifest["files"][path] = {
            "split": split,
            "bytes": len(text),
            "sha256": hashlib.sha256(text.encode()).hexdigest()[:16],
        }

    for split, parts in splits.items():
        blob = "".join(parts)
        out_path = os.path.join(args.out, f"{split}.txt")
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(blob)
        manifest[f"{split}_bytes"] = len(blob)
        print(f"{split}: {len(blob)/1e6:.2f} MB -> {out_path}")

    with open(os.path.join(args.out, "MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    print(f"total {total/1e6:.2f} MB from {len(manifest['files'])} files")


if __name__ == "__main__":
    main()

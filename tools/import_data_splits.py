"""Install the paper's pinned evaluation/training split assets.

The reference ships the exact evaluation pairs and file lists used for the
paper's numbers under data_splits/ (ref data_splits/: speaker-sim CSVs with
15.6k/14k pinned pairs, *_intelli.txt subsets, test-clean.py/dev-clean.py
LibriSpeech path lists, wavlm-hifigan-{train,valid}.csv training splits).
The evaluation harnesses here (`knnsvc_tpu.eval.speaker_sim`,
`knnsvc_tpu.eval.intelligibility`) consume those files as-is, so
paper-protocol runs are reproducible bit-for-bit once the assets are
installed from an upstream checkout — this tool copies them, validates the
expected schema/row counts, and writes a MANIFEST.json with SHA-256 hashes
so a run's split provenance is pinned.

Usage:
  python tools/import_data_splits.py --source /path/to/knn-svc/data_splits \
      --dest ./data_splits [--strict]

--strict fails if any known asset is missing or has an unexpected row count.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import shutil
import sys
from pathlib import Path

# (filename, kind, expected rows incl. header where applicable; None = don't check)
KNOWN_ASSETS = [
    ("speaker-sim-test-clean.csv", "sim_pairs", 15601),
    ("speaker-sim-dev-clean.csv", "sim_pairs", 15601),
    ("test_to_test.txt", "sim_pairs", 15601),
    ("OpenSinger_test_to_OpenSinger_test.txt", "sim_pairs", 14077),
    ("OpenSinger_test_to_nus-smc-corpus_48.txt", "sim_pairs", 14077),
    ("test_intelli.txt", "utt_list", 200),
    ("OpenSinger_test_intelli.txt", "utt_list", 300),
    ("test-clean.py", "utt_list", 200),    # plain path list despite .py ext
    ("dev-clean.py", "utt_list", 200),
    ("wavlm-hifigan-train.csv", "file_pairs", None),
    ("wavlm-hifigan-valid.csv", "file_pairs", None),
]

SIM_HEADER = "src_speaker,tgt_speaker,x_path,y_path,label"
FILE_PAIRS_HEADER = "audio_path,feat_path"


def validate(path: Path, kind: str, expected_rows: int | None) -> tuple[int, list[str]]:
    """Returns (row count, problems)."""
    problems: list[str] = []
    lines = path.read_text().splitlines()
    n = len(lines)
    if kind == "sim_pairs":
        if not lines or lines[0].strip() != SIM_HEADER:
            problems.append(f"unexpected header: {lines[0][:80] if lines else '<empty>'!r}")
        bad = [i for i, l in enumerate(lines[1:], 2)
               if l.strip() and l.strip().rsplit(",", 1)[-1] not in ("0", "1")]
        if bad:
            problems.append(f"{len(bad)} rows with label not in {{0,1}} (first at line {bad[0]})")
    elif kind == "file_pairs":
        if not lines or lines[0].strip() != FILE_PAIRS_HEADER:
            problems.append(f"unexpected header: {lines[0][:80] if lines else '<empty>'!r}")
    elif kind == "utt_list":
        empty = sum(1 for l in lines if not l.strip())
        if empty:
            problems.append(f"{empty} blank lines")
    if expected_rows is not None and n != expected_rows:
        problems.append(f"expected {expected_rows} lines, found {n}")
    return n, problems


def import_splits(source: str | Path, dest: str | Path, strict: bool = False) -> dict:
    source, dest = Path(source), Path(dest)
    dest.mkdir(parents=True, exist_ok=True)
    manifest: dict[str, dict] = {}
    errors: list[str] = []

    for name, kind, expected in KNOWN_ASSETS:
        src = source / name
        if not src.is_file():
            errors.append(f"missing: {name}")
            continue
        rows, problems = validate(src, kind, expected)
        errors += [f"{name}: {p}" for p in problems]
        out = dest / name
        shutil.copyfile(src, out)
        manifest[name] = {
            "kind": kind,
            "rows": rows,
            "sha256": hashlib.sha256(src.read_bytes()).hexdigest(),
        }

    (dest / "MANIFEST.json").write_text(json.dumps(
        {"source": str(source), "assets": manifest, "problems": errors}, indent=2))
    if strict and errors:
        raise SystemExit("import failed:\n  " + "\n  ".join(errors))
    return manifest


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--source", required=True,
                    help="data_splits/ dir of an upstream knn-svc checkout")
    ap.add_argument("--dest", default="data_splits")
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args(argv)
    manifest = import_splits(args.source, args.dest, strict=args.strict)
    for name, info in manifest.items():
        print(f"{name}: {info['rows']} rows sha256={info['sha256'][:12]}")
    print(f"-> {args.dest}/MANIFEST.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

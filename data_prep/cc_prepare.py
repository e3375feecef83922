"""Conceptual Captions download/prep tooling.

ref: data/conceptual-captions/utils/ + ReadMe.txt — TSV -> url lists,
validity check, jsonl db generation. Zero-egress environments use
pre-downloaded images; this script covers the db side:
  tsv-to-urls:  TSV (caption \t url) -> url list + caption list
  build-db:     captions + frcnn feature dir -> train_frcnn.json jsonl db
"""

import argparse
import json
import os


def tsv_to_urls(tsv_path, out_prefix):
    urls, caps = [], []
    with open(tsv_path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 2:
                continue
            caption, url = parts
            caps.append(caption)
            urls.append(url)
    with open(out_prefix + ".urls", "w") as f:
        f.write("\n".join(urls))
    with open(out_prefix + ".captions", "w") as f:
        f.write("\n".join(caps))
    return len(urls)


def check_valid(rows, base_dir=""):
    """Drop rows whose image fails to open. Paths are resolved against
    ``base_dir`` (db rows store dataset-relative paths — resolving against
    the CWD silently dropped EVERY row when run from elsewhere)."""
    from PIL import Image

    good, bad = [], 0
    for r in rows:
        path = r["image"] if os.path.isabs(r["image"]) \
            else os.path.join(base_dir, r["image"])
        try:
            with Image.open(path) as im:
                im.verify()
            good.append(r)
        except Exception:
            bad += 1
    if bad:
        print(f"check_valid: dropped {bad}/{len(rows)} rows "
              f"(unreadable images under {base_dir or '.'})")
    if rows and not good:
        raise SystemExit(
            f"check_valid dropped ALL {len(rows)} rows — wrong base dir? "
            f"(resolved against {base_dir or 'the current directory'})")
    return good


def build_db(captions_file, image_dir, frcnn_dir, out_path, validate=False):
    with open(captions_file, encoding="utf-8") as f:
        caps = [l.rstrip("\n") for l in f]
    rows = []
    for i, caption in enumerate(caps):
        frcnn = os.path.join(frcnn_dir, f"{i}.json")
        if not os.path.exists(frcnn):
            continue
        rows.append({"image": os.path.join(image_dir, f"{i}.jpg"),
                     "frcnn": frcnn, "caption": caption})
    if validate:
        rows = check_valid(rows, base_dir=os.path.dirname(os.path.abspath(out_path)))
    with open(out_path, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    print(f"wrote {len(rows)} rows to {out_path}")
    return len(rows)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("tsv-to-urls")
    t.add_argument("tsv")
    t.add_argument("out_prefix")
    b = sub.add_parser("build-db")
    b.add_argument("captions")
    b.add_argument("image_dir")
    b.add_argument("frcnn_dir")
    b.add_argument("out")
    b.add_argument("--validate", action="store_true")
    args = ap.parse_args()
    if args.cmd == "tsv-to-urls":
        tsv_to_urls(args.tsv, args.out_prefix)
    else:
        build_db(args.captions, args.image_dir, args.frcnn_dir, args.out,
                 args.validate)

#!/usr/bin/env python3
"""PMV-400 video downloader.

Functional equivalent of the reference `data/download_videos.py`
(`DATA.md:9-27` workflow): reads `video_links.csv` rows of
`<video_id>.mp4,<url>`, fetches each mp4 with a browser UA, validates the
content type, skips already-downloaded files, and records failures in
`fail_cases.csv` for retry. Uses only the standard library (urllib) and a
process pool.

Usage:
    python data/download_videos.py --links video_links.csv \
        --target-dir ./PMV_dataset [--workers 16]

The links CSV ships with the upstream Portrait-Mode-Video release
(https://github.com/bytedance/Portrait-Mode-Video, data/video_links.csv).
"""

import argparse
import csv
import os
import urllib.request
from multiprocessing import Pool

UA = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0 Safari/537.36"
)


def fetch_one(args):
    name, url, target_dir = args
    out_path = os.path.join(target_dir, name)
    if os.path.exists(out_path) and os.path.getsize(out_path) > 0:
        return name, True, "exists"
    req = urllib.request.Request(url, headers={"User-Agent": UA})
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            ctype = resp.headers.get("Content-Type", "")
            if "video" not in ctype and "octet-stream" not in ctype:
                return name, False, f"bad content-type {ctype}"
            data = resp.read()
        with open(out_path, "wb") as f:
            f.write(data)
        return name, True, "ok"
    except Exception as e:  # noqa: BLE001 — record any failure for retry
        return name, False, str(e)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--links", default="video_links.csv")
    ap.add_argument("--target-dir", default="./PMV_dataset")
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument(
        "--fail-csv", default="fail_cases.csv",
        help="failures written here; re-run with --links fail_cases.csv",
    )
    args = ap.parse_args()
    os.makedirs(args.target_dir, exist_ok=True)

    jobs = []
    with open(args.links) as f:
        for row in csv.reader(f):
            if len(row) < 2:
                continue
            jobs.append((row[0], row[1], args.target_dir))
    print(f"{len(jobs)} videos to fetch -> {args.target_dir}")

    failed = []
    with Pool(args.workers) as pool:
        for i, (name, ok, msg) in enumerate(pool.imap_unordered(fetch_one, jobs)):
            if not ok:
                failed.append((name, msg))
            if (i + 1) % 500 == 0:
                print(f"{i + 1}/{len(jobs)} done, {len(failed)} failed")

    if failed:
        url_of = {n: u for n, u, _ in jobs}
        with open(args.fail_csv, "w", newline="") as f:
            w = csv.writer(f)
            for name, msg in failed:
                w.writerow([name, url_of.get(name, ""), msg])
        print(f"{len(failed)} failures recorded in {args.fail_csv}")
    else:
        print("all downloads succeeded")


if __name__ == "__main__":
    main()

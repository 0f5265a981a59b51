"""Convert an image folder into an LSUN-layout lmdb database (the format
ddpm_exp/datasets/lsun.py:11-38 reads), using the pure-Python LMDB writer —
lets the LSUN-256 configs train from any local image collection in this
zero-egress environment.

    python tools/make_lsun_lmdb.py --src <image-dir> --out data/lsun/church_outdoor_train_lmdb
"""

import argparse
import hashlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True, help="image folder (recursive)")
    p.add_argument("--out", required=True, help="output lmdb directory")
    p.add_argument("--format", default="WEBP", choices=["WEBP", "PNG", "JPEG"],
                   help="re-encode format (LSUN uses webp)")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    from PIL import Image

    from diff_pruning_tpu.data.datasets import list_image_files
    from diff_pruning_tpu.data.lmdb_io import write_lmdb

    files = list_image_files(args.src)
    if args.limit:
        files = files[:args.limit]
    if not files:
        raise SystemExit(f"no images under {args.src}")
    items = []
    for i, f in enumerate(files):
        im = Image.open(f).convert("RGB")
        buf = io.BytesIO()
        kw = {"lossless": True} if args.format == "WEBP" else {}
        im.save(buf, format=args.format, **kw)
        # LSUN keys are md5 hex digests of the image id; hash the path
        key = hashlib.md5(f.encode()).hexdigest().encode()
        items.append((key, buf.getvalue()))
        if (i + 1) % 500 == 0:
            print(f"  encoded {i + 1}/{len(files)}")
    out = write_lmdb(args.out, items)
    print(f"wrote {len(items)} entries to {out}")


if __name__ == "__main__":
    main()

"""Train a place-recognition vocabulary from a dataset.

The analog of producing the reference's ``brief_k10L6.bin`` artifact
(``pose_graph`` loads it at startup, ``LoopClosure.cpp:18-55``; the file is
fetched separately in the reference — here it can be trained from the
user's own imagery): detect + describe a strided subset of frames, run
Hamming k-medoids on the pooled descriptors, compute TF_IDF word weights
with each frame as one document, and save with ``save_vocabulary``.

Usage:
  python -m svin_tpu.apps.train_vocabulary <euroc_folder> <out.npz> \
      [--size 1024] [--stride 10] [--max-frames 200] [--iters 8] [--product]

``--product`` trains the two-level product-quantized vocabulary instead
(256x256 = 65k effective words as two 128-bit half codebooks + joint idf —
the DBoW2 tree-scale option); ``LoopCloser`` auto-detects the format.
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", help="EuRoC-layout folder (mav0/...)")
    ap.add_argument("out", help="output vocabulary path (.npz)")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--stride", type=int, default=10)
    ap.add_argument("--max-frames", type=int, default=200)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--max-keypoints", type=int, default=400)
    ap.add_argument(
        "--product", action="store_true",
        help="train the 65k-effective-word product vocabulary",
    )
    args = ap.parse_args(argv)

    from ..loopclosure.retrieval import (
        compute_idf,
        save_vocabulary,
        train_vocabulary,
    )
    from ..ops import descriptor as desc_ops, detection
    from ..pipeline.dataset import read_euroc_folder

    import glob
    import os

    root = args.dataset
    if os.path.isdir(os.path.join(root, "mav0")):
        root = os.path.join(root, "mav0")
    num_cams = max(1, len(glob.glob(os.path.join(root, "cam*"))))

    docs = []
    pooled = []
    n_imgs = 0
    for ev in read_euroc_folder(args.dataset, num_cams=num_cams):
        if ev.kind != "frame" or not ev.images:
            continue
        n_imgs += 1
        if (n_imgs - 1) % args.stride:
            continue
        if len(docs) >= args.max_frames:
            break
        img = np.asarray(ev.images[0], np.float32)
        if img.max() > 1.5:  # uint8-range input
            img = img / 255.0
        img = jnp.asarray(img)
        kp = detection.detect(img, max_keypoints=args.max_keypoints)
        d = desc_ops.describe(img, kp.uv, kp.angle, kp.valid)
        docs.append((d, kp.valid))
        pooled.append(np.asarray(d)[np.asarray(kp.valid)])
    if not pooled:
        print("no images found")
        return 2

    train = jnp.asarray(np.concatenate(pooled))
    print(f"training on {train.shape[0]} descriptors from {len(docs)} frames")
    if args.product:
        from ..loopclosure.retrieval import (
            compute_idf_product,
            save_product_vocabulary,
            train_product_vocabulary,
        )

        pv = train_product_vocabulary(train, iters=args.iters)
        pv = pv._replace(idf=compute_idf_product(docs, pv))
        save_product_vocabulary(args.out, pv)
        print(f"saved product (65k-effective-word) vocabulary to {args.out}")
        return 0
    vocab = train_vocabulary(train, size=args.size, iters=args.iters)
    idf = compute_idf(docs, vocab)
    save_vocabulary(args.out, vocab, weights=idf)
    print(f"saved {args.size}-word vocabulary + idf weights to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""HuBERT + k-means semantic tokenization CLI.

Parity target: ``/root/reference/scripts/hubert_kmeans.py`` — identical
flags and outputs: without ``-c``, sample ``--percentage`` of files,
extract HuBERT features, train k-means (vocab=200, niter=20), save
``kmeans_v{vocab}.npy`` centroids next to the output; then (either mode)
tokenize every file to ``line|tok tok ...`` lines.  Skips clips ≥
``size_max`` s; asserts 16 kHz input.

TPU-native: the HF HubertModel + faiss become the JAX
``HubertEncoder`` (+ bf16 compute, the fp16-on-GPU analogue) and the
MXU matmul-argmin k-means in ``ops/kmeans.py``.  Unlike the
reference's one-file-per-forward loop, files are batched
(``--batch_size``, grouped into 1 s length buckets so each (batch,
padded-length) shape compiles once), audio decode runs on a thread
pool overlapping TPU compute, and output order is preserved.
"""
from __future__ import annotations

import argparse
import logging
import os
import random
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional

import numpy as np


def load_metadata(metadata: str):
    lines, fns = [], []
    with open(metadata, "r", errors="ignore") as f:
        for line in f:
            if not line.strip():
                continue
            lines.append(line.strip())
            fns.append(line.strip().split("|")[0])
    return lines, fns


BUCKET = 16000          # 1 s length buckets → few compiled shapes
SLAB = 512              # files resident in memory at once


def main() -> None:
    parser = argparse.ArgumentParser(
        prog="Run HuBERT tokenization on a parsed metadata")
    parser.add_argument("-i", "--input", required=True)
    parser.add_argument("-w", "--wavdir", required=True)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("-m", "--model",
                        default="facebook/hubert-large-ll60k")
    parser.add_argument("-c", "--centroids", default=None)
    parser.add_argument("-d", "--delimiter", default=" ")
    parser.add_argument("-v", "--vocab", type=int, default=200)
    parser.add_argument("-p", "--percentage", type=float, default=0.1)
    parser.add_argument("-s", "--size_max", type=float, default=60)
    parser.add_argument("-b", "--batch_size", type=int, default=8)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 compute for the encoder")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    from ..core import precision
    from ..data import audio as audio_lib
    from ..models.ssl.hubert import from_hf_pretrained, normalize_input
    from ..ops.kmeans import KMeans
    from flax import nnx

    if args.bf16:
        precision.set_policy(precision.bf16_mixed())

    model = from_hf_pretrained(args.model)
    graphdef, state = nnx.split(model)

    @jax.jit
    def encode(state, wave, lengths):
        return nnx.merge(graphdef, state)(wave, lengths)

    def load_one(fn: str) -> Optional[np.ndarray]:
        wave, sr = audio_lib.load_audio(os.path.join(args.wavdir, fn))
        assert sr == 16000
        wave = audio_lib.to_mono(wave)
        if len(wave) / float(sr) >= args.size_max:
            return None
        return normalize_input(wave)

    bsz = args.batch_size

    def encode_many(waves: List[Optional[np.ndarray]]
                    ) -> List[Optional[np.ndarray]]:
        """Batched bucket-padded encoding; feats[i] aligns with
        waves[i] (None for skipped files)."""
        feats: List[Optional[np.ndarray]] = [None] * len(waves)
        buckets = defaultdict(list)
        for i, w in enumerate(waves):
            if w is not None and len(w) > 0:
                padded = int(np.ceil(len(w) / BUCKET)) * BUCKET
                buckets[padded].append(i)
        for padded in sorted(buckets):
            idxs = buckets[padded]
            for start in range(0, len(idxs), bsz):
                chunk = idxs[start: start + bsz]
                # Fixed batch: pad with empty rows so each
                # (batch, padded) shape compiles exactly once.
                batch = np.zeros((bsz, padded), np.float32)
                lengths = np.zeros((bsz,), np.int32)
                for j, gi in enumerate(chunk):
                    w = waves[gi]
                    batch[j, : len(w)] = w
                    lengths[j] = len(w)
                out = np.asarray(encode(state, batch,
                                        np.maximum(lengths, 1)))
                for j, gi in enumerate(chunk):
                    nf = model.frame_count(int(lengths[j]))
                    feats[gi] = out[j][:nf]
        return feats

    def slabs(items):
        for i in range(0, len(items), SLAB):
            yield items[i: i + SLAB]

    pool = ThreadPoolExecutor(max_workers=8)
    dataset = list(zip(*load_metadata(args.input)))

    if args.centroids is None:
        subset = random.sample(dataset,
                               int(len(dataset) * args.percentage))
        kmvs = []
        for slab in slabs(subset):
            waves = list(pool.map(load_one, [fn for _, fn in slab]))
            kmvs.extend(f for f in encode_many(waves) if f is not None)
        kmvs = np.concatenate(kmvs, 0)
        logging.info("Training Kmeans on %s features...", kmvs.shape)
        kmeans = KMeans(kmvs.shape[-1], args.vocab, niter=20)
        kmeans.train(kmvs)
        index_fn = (Path(args.output).parents[0]
                    / f"kmeans_v{args.vocab}.npy")
        kmeans.save(str(index_fn))
        logging.info("Saved centroids to %s", index_fn)
    else:
        kmeans = KMeans.load(args.centroids)

    with open(args.output, "w") as f:
        for slab in slabs(dataset):
            waves = list(pool.map(load_one, [fn for _, fn in slab]))
            feats = encode_many(waves)
            for (line, _fn), ft in zip(slab, feats):
                if ft is None:
                    continue
                toks = kmeans.search(ft)
                f.write(f"{line}|{args.delimiter.join(map(str, toks))}\n")
    logging.info("Wrote tokens to %s", args.output)


if __name__ == "__main__":
    main()

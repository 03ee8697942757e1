"""HuBERT + k-means semantic tokenization CLI.

Parity target: ``/root/reference/scripts/hubert_kmeans.py`` — identical
flags and outputs: without ``-c``, sample ``--percentage`` of files,
extract HuBERT features, train k-means (vocab=200, niter=20), save
``kmeans_v{vocab}.npy`` centroids next to the output; then (either mode)
tokenize every file to ``line|tok tok ...`` lines.  Skips clips ≥
``size_max`` s; asserts 16 kHz input.

TPU-native: the HF HubertModel + faiss become the JAX
``HubertEncoder`` (+ bf16 compute, the fp16-on-GPU analogue) and the
MXU matmul-argmin k-means in ``ops/kmeans.py``.
"""
from __future__ import annotations

import argparse
import logging
import os
import random
from pathlib import Path

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

    def features(path: str):
        wave, sr = audio_lib.load_audio(path)
        assert sr == 16000
        wave = audio_lib.to_mono(wave)
        if len(wave) / float(sr) >= args.size_max:
            return None
        wave = normalize_input(wave)
        # Bucket-pad for compile-cache friendliness; padded frames are
        # masked out of attention inside the encoder.
        bucket = 16000
        padded = int(np.ceil(len(wave) / bucket)) * bucket
        n_frames = model.frame_count(len(wave))
        lengths = np.asarray([len(wave)], np.int32)
        wave = np.pad(wave, (0, padded - len(wave)))
        out = np.asarray(encode(state, wave[None], lengths))[0]
        return out[:n_frames]

    dataset = list(zip(*load_metadata(args.input)))

    if args.centroids is None:
        subset = random.sample(dataset,
                               int(len(dataset) * args.percentage))
        kmvs = []
        for line, fn in subset:
            out = features(os.path.join(args.wavdir, fn))
            if out is not None:
                kmvs.append(out)
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
        for line, fn in dataset:
            out = features(os.path.join(args.wavdir, fn))
            if out is None:
                continue
            toks = kmeans.search(out)
            f.write(f"{line}|{args.delimiter.join(map(str, toks))}\n")
    logging.info("Wrote tokens to %s", args.output)


if __name__ == "__main__":
    main()

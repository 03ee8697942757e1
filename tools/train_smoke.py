"""Flagship-dims convergence smoke on the real chip (VERDICT r2 item 6).

Runs a few hundred REAL optimizer steps of the full LVTRTrainer jitted
train step (grad-accum scan, clipping, AdamW, KLD schedule) at the
flagship config — 16L/d1024 trunk, flow prior, diffusion decoder,
reference batch config 8 x accum 2 x 640 frames — on synthetic but
*learnable* data, and reports the loss curve.  Proves the training
path descends at scale (not just 16-dim CPU toys): data pipeline
shapes, jitted step, optimizer, schedule.

Synthetic data: smooth low-rank mel trajectories + per-frame tokens
derived from the mel content, so rec_loss, token CE and the KLD all
have real structure to fit.

Usage: python tools/train_smoke.py [steps] [log_every] [save_ckpt]

With a third argument, the trained model is saved as a compact
checkpoint (``save_ckpt`` path, npz) so downstream chip evals —
``tools/bench_quant_quality.py`` in particular — can measure
quantization deltas on a model with SHARP logits: at random init the
token distribution is near-uniform over the vocab, so any two
serving rungs diverge at step 0 by construction and token agreement
reads at the 1/vocab chance floor (measured: 0.010 ≈ 1/200).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def synth_batch(rng, accum, b, t, n_mels, vocab):
    """Smooth mel trajectories + content-derived tokens."""
    from vae_gslm_tpu.core.masked import Masked

    # low-rank smooth process: random walks through a fixed basis
    basis = rng.randn(12, n_mels).astype(np.float32)
    walk = np.cumsum(rng.randn(accum, b, t, 12).astype(np.float32) * 0.3,
                     axis=2)
    walk = walk - walk.mean(axis=2, keepdims=True)
    mel = np.tanh(walk @ basis * 0.2) * 1.2 - 1.2
    # tokens follow the dominant basis coefficient per frame
    tok = (np.argmax(walk, axis=-1) * (vocab // 12)
           + (walk.max(-1) > 0.5)).astype(np.int64) % vocab
    utt_t = 100
    utt = mel[:, :, :utt_t]
    full = np.full((accum, b), t, np.int32)
    return {
        "mel": Masked(mel, full, 1),
        "tokens": Masked(tok, full, 1),
        "cropped_mel_utt": Masked(utt, np.full((accum, b), utt_t,
                                               np.int32), 1),
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    log_every = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    save_ckpt = sys.argv[3] if len(sys.argv) > 3 else None
    from flax import nnx

    from vae_gslm_tpu.hparams.hp import Hparams
    from vae_gslm_tpu.models.vocoder.vocoder import HiFiGAN
    from vae_gslm_tpu.trainers.speech.lvtr import LVTRTrainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hp = Hparams.from_yamlfile(os.path.join(
        root, "configs", "train", "speech", "vae-gslm.yaml"))
    voc_hp = Hparams.from_yamlfile(os.path.join(
        root, "configs", "train", "vocoder",
        "hfgan_16k_50hz_librispeech.yaml"))

    with tempfile.TemporaryDirectory() as tmp:
        voc_dir = os.path.join(tmp, "vocoder")
        HiFiGAN(voc_hp, rngs=nnx.Rngs(0)).save_pretrained(voc_dir)
        hp.vocoder.path = voc_dir
        hp.trainer.distributed = False
        hp.logging.log_dir = os.path.join(tmp, "out")

        trainer = LVTRTrainer(hp)
        accum = hp.training.gradient_accumulation      # 2
        b = hp.data.train.batch_size                   # 8
        t = 640
        n_mels = trainer.vocoder.hp.n_mels
        vocab = hp.model.tokens.vocab_size
        rng = np.random.RandomState(0)
        batches = [synth_batch(rng, accum, b, t, n_mels, vocab)
                   for _ in range(8)]

        curve = []
        t0 = time.time()
        for i in range(steps):
            m = trainer.run_step(batches[i % len(batches)])
            trainer.global_step += 1
            if i % log_every == 0 or i == steps - 1:
                rec = {k: float(v) for k, v in m.items()}
                rec["step"] = i
                rec["wall_s"] = round(time.time() - t0, 1)
                curve.append(rec)
                print(f"step {i:4d}  rec {rec['rec_loss']:.4f}  "
                      f"kld {rec['kld']:.4f}  token {rec['token_kld']:.4f}"
                      f"  lr {rec['lr']:.2e}  grad {rec['grad_norm']:.1f}"
                      f"  t+{rec['wall_s']}s", flush=True)

        if save_ckpt:
            # trainer.save_checkpoint syncs the LIVE params pytree back
            # into the module first — the jitted step donates params,
            # so the module's init-time buffers are long deleted.
            trainer.save_checkpoint(save_ckpt)
            print(f"compact checkpoint saved to {save_ckpt}")

        out = os.path.join(root, "train_smoke_curve.json")
        with open(out, "w") as f:
            json.dump(curve, f, indent=1)
        first, last = curve[0], curve[-1]
        n_avg = max(1, len(curve) // 5)
        rec0 = np.mean([c["rec_loss"] for c in curve[:n_avg]])
        rec1 = np.mean([c["rec_loss"] for c in curve[-n_avg:]])
        tok0 = np.mean([c["token_kld"] for c in curve[:n_avg]])
        tok1 = np.mean([c["token_kld"] for c in curve[-n_avg:]])
        ms = (last["wall_s"] - first["wall_s"]) / max(1, steps - 1) * 1e3
        print(f"\n{steps} steps, {ms:.0f} ms/step steady-state")
        print(f"rec_loss  {rec0:.4f} -> {rec1:.4f} "
              f"({(1 - rec1 / rec0) * 100:+.1f}%)")
        print(f"token_kld {tok0:.4f} -> {tok1:.4f} "
              f"({(1 - tok1 / tok0) * 100:+.1f}%)")
        print(f"curve written to {out}")
        assert rec1 < rec0, "reconstruction loss did not descend"
        assert tok1 < tok0, "token CE did not descend"


if __name__ == "__main__":
    main()

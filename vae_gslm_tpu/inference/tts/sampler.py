"""TTS autoregressive sampler with EOS stopping.

Parity target: ``/root/reference/trainers/tts/sampler.py``
(``ARTRTTSSampler``).  The reference shrinks the batch (and every KV
tensor) as sequences hit EOS — dynamic shapes that cannot compile on
TPU.  Here the batch stays fixed and an ``active`` mask freezes
finished sequences: the scan runs to ``max_frames``, per-example
lengths are recorded at first EOS, and padded frames are masked out of
the diffusion decode.  Same outputs, one compiled program.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import nnx

from ...core.masked import Masked

Array = jax.Array


class ARTRTTSSampler:
    def __init__(self, model):
        self.model = model
        self._compiled = {}

    def _build(self, max_frames: int, min_frames: int,
               temperature: float, eos_threshold: float):
        graphdef, state = nnx.split(self.model)

        @jax.jit
        def run(state, text: Masked, spkr: Masked, key: Array):
            model = nnx.merge(graphdef, state)
            k_init, k_pre, k_scan, k_dec = jax.random.split(key, 4)
            memory, spkr_emb = model.encode_condition(text, spkr)
            memory = model.transformer.project_memory(memory)
            b = text.value.shape[0]
            caches = model.init_cache(b, max_frames + 1)
            init = model.initial_state(k_init, b)
            frame0, caches, eos0 = _tts_step(
                model, init, memory, caches, jnp.asarray(0), k_pre,
                temperature, eos_threshold)

            def body(carry, inp):
                frame, caches, pos, active, lengths = carry
                k_i, i = inp
                nxt, caches, eos = _tts_step(
                    model, frame, memory, caches, pos, k_i,
                    temperature, eos_threshold)
                emitted = jnp.where(active[:, None, None], frame,
                                    0.0)[:, 0]
                newly_done = active & eos & (i >= min_frames)
                lengths = jnp.where(newly_done, pos, lengths)
                active = active & ~newly_done
                return (nxt, caches, pos + 1, active, lengths), emitted

            keys = jax.random.split(k_scan, max_frames)
            active0 = jnp.ones((b,), bool)
            lengths0 = jnp.full((b,), max_frames, jnp.int32)
            (_, _, _, active, lengths), frames = jax.lax.scan(
                body, (frame0, caches, jnp.asarray(1), active0,
                       lengths0),
                (keys, jnp.arange(max_frames)))
            frames = jnp.swapaxes(frames, 0, 1)  # (B, max_frames, C)
            out = Masked.from_lengths(frames, lengths)
            mel = model.decode(out.apply_mask(), k_dec)
            return {"output": mel, "frames": out, "lengths": lengths}

        return run

    def __call__(self, text: Masked, spkr: Masked, key: Array,
                 max_frames: int, min_frames: int = 1,
                 temperature: float = 1.0,
                 eos_threshold: float = 0.5) -> Dict[str, Any]:
        sig = (max_frames, min_frames, temperature, eos_threshold)
        if sig not in self._compiled:
            self._compiled[sig] = self._build(*sig)
        _, state = nnx.split(self.model)
        return self._compiled[sig](state, text, spkr, key)


def _tts_step(model, frame, memory, caches, pos, key, temperature,
              eos_threshold):
    """One AR step for LVTTS: self-attention over the static cache,
    stateless cross-attention against the pre-projected memory."""
    k_prior, _ = jax.random.split(key)
    h, caches = model.transformer.decode(frame, caches, pos,
                                         memory=memory)
    hm = Masked.full(h)
    q_split = model.q_spliter(hm) if model.use_tokens else hm
    z = model.prior_head(q_split, k_prior, temperature=temperature)
    sample_z = z.sample
    if model.transformer_flow is not None:
        sample_z = model.transformer_flow.reverse(sample_z, c=q_split)
    eos = model.is_eos(hm, eos_threshold)[:, -1]
    return sample_z.value, caches, eos

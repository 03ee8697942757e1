"""TTS autoregressive sampler with EOS stopping.

Parity target: ``/root/reference/trainers/tts/sampler.py``
(``ARTRTTSSampler``).  The reference shrinks the batch (and every KV
tensor) as sequences hit EOS — dynamic shapes that cannot compile on
TPU.  Here the batch stays fixed and an ``active`` mask freezes
finished sequences: the scan runs to ``max_frames``, per-example
lengths are recorded at first EOS, and padded frames are masked out of
the diffusion decode.  Same outputs, one compiled program.

``return_attn`` mirrors the reference's attention-map collection
(``trainers/tts/sampler.py:26-60``): per-step self/cross attention
rows are emitted as scan outputs (bf16) and assembled into
``(B, L, H, Q, KV)`` maps, plus the text-encoder self-attention
``text_self_attn``; consumers truncate per sample with
``outputs["lengths"]`` / ``text.lengths``.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import nnx

from ...core.masked import Masked

Array = jax.Array


class ARTRTTSSampler:
    """``mesh``: optional Mesh for multi-chip serving (batch sharded on
    the data axis; trunk tensor-sharded on a (data, model) mesh — see
    ``parallel/tp.py`` and ``inference/speech/sampler.py``)."""

    def __init__(self, model, mesh=None):
        self.model = model
        self.mesh = mesh
        self._compiled = {}

    def _place(self, state, *batched: Masked):
        if self.mesh is None:
            return (state,) + batched
        from ...parallel import mesh as mesh_lib
        state = mesh_lib.place_params(state, self.mesh)
        out = []
        for m in batched:
            sh = mesh_lib.shard_batch(
                {"v": m.value, "l": m.lengths}, self.mesh)
            out.append(Masked(sh["v"], sh["l"], m.time_axis))
        return (state,) + tuple(out)

    def _build(self, max_frames: int, min_frames: int,
               temperature: float, eos_threshold: float,
               return_attn: bool):
        graphdef, state = nnx.split(self.model)
        # Fused layer-scan decode with precomputed per-layer memory
        # K/V (cross-attention kv_proj hoisted out of the AR loop) —
        # same win as the speech samplers' stacked path.  Single-mesh,
        # no-attn-maps only; requires RMSNorm/no-cross-RPE
        # (supports_stacked_decode(allow_cross=True)).
        use_stacked = (self.mesh is None and not return_attn
                       and self.model.transformer
                           .supports_stacked_decode(allow_cross=True))

        @jax.jit
        def run(state, text: Masked, spkr: Masked, key: Array):
            model = nnx.merge(graphdef, state)
            k_init, k_pre, k_scan, k_dec = jax.random.split(key, 4)
            outputs: Dict[str, Any] = {}
            if return_attn:
                memory, spkr_emb, text_attn = model.encode_condition(
                    text, spkr, return_attn=True)
                # (L,B,H,T,T) -> (B,L,H,T,T)
                outputs["text_self_attn"] = jnp.swapaxes(text_attn, 0, 1)
            else:
                memory, spkr_emb = model.encode_condition(text, spkr)
            memory = model.transformer.project_memory(memory)
            b = text.value.shape[0]
            stacked = (model.transformer.build_stacked_decode(
                allow_cross=True) if use_stacked and b <= 32 else None)
            mem_kv = (model.transformer.build_stacked_memory(memory)
                      if stacked is not None else None)
            caches = model.init_cache(b, max_frames + 1,
                                      stacked=stacked is not None)
            step0 = _tts_step(model, model.initial_state(k_init, b),
                              memory, caches, jnp.asarray(0), k_pre,
                              temperature, eos_threshold, return_attn,
                              stacked=stacked, mem_kv=mem_kv)
            frame0, caches, eos0 = step0[:3]

            def body(carry, inp):
                frame, caches, pos, active, lengths = carry
                k_i, i = inp
                res = _tts_step(model, frame, memory, caches, pos, k_i,
                                temperature, eos_threshold, return_attn,
                                stacked=stacked, mem_kv=mem_kv)
                nxt, caches, eos = res[:3]
                emitted = jnp.where(active[:, None, None], frame,
                                    0.0)[:, 0]
                newly_done = active & eos & (i >= min_frames)
                lengths = jnp.where(newly_done, pos, lengths)
                active = active & ~newly_done
                ys = (emitted, res[3]) if return_attn else emitted
                return (nxt, caches, pos + 1, active, lengths), ys

            keys = jax.random.split(k_scan, max_frames)
            active0 = jnp.ones((b,), bool)
            lengths0 = jnp.full((b,), max_frames, jnp.int32)
            (_, _, _, active, lengths), ys = jax.lax.scan(
                body, (frame0, caches, jnp.asarray(1), active0,
                       lengths0),
                (keys, jnp.arange(max_frames)))
            if return_attn:
                frames, attn_ys = ys
                for name in ("self_attn", "cross_attn"):
                    # step0 row + scan rows: (Q,L,B,H,KV) -> (B,L,H,Q,KV)
                    rows = jnp.concatenate(
                        [step0[3][name][None], attn_ys[name]])
                    outputs[name] = jnp.transpose(
                        rows, (2, 1, 3, 0, 4)).astype(jnp.float32)
            else:
                frames = ys
            frames = jnp.swapaxes(frames, 0, 1)  # (B, max_frames, C)
            out = Masked.from_lengths(frames, lengths)
            mel = model.decode(out.apply_mask(), k_dec)
            outputs.update(output=mel, frames=out, lengths=lengths)
            return outputs

        return run

    def __call__(self, text: Masked, spkr: Masked, key: Array,
                 max_frames: int, min_frames: int = 1,
                 temperature: float = 1.0,
                 eos_threshold: float = 0.5,
                 return_attn: bool = False) -> Dict[str, Any]:
        sig = (max_frames, min_frames, temperature, eos_threshold,
               return_attn)
        if sig not in self._compiled:
            self._compiled[sig] = self._build(*sig)
        _, state = nnx.split(self.model)
        state, text, spkr = self._place(state, text, spkr)
        return self._compiled[sig](state, text, spkr, key)


def _tts_step(model, frame, memory, caches, pos, key, temperature,
              eos_threshold, return_attn=False, stacked=None,
              mem_kv=None):
    """One AR step for LVTTS: self-attention over the static cache,
    stateless cross-attention against the pre-projected memory (or,
    with ``stacked``/``mem_kv``, the fused layer-scan with
    precomputed memory K/V)."""
    k_prior, _ = jax.random.split(key)
    if stacked is not None:
        res = model.transformer.decode_stacked(frame, stacked, caches,
                                               pos, memory_kv=mem_kv)
    else:
        res = model.transformer.decode(frame, caches, pos,
                                       memory=memory,
                                       return_attn=return_attn)
    if return_attn:
        h, caches, attn = res
        # (L,B,H,1,KV) -> (L,B,H,KV), bf16 so long scans stay cheap.
        attn = {k: v[:, :, :, 0].astype(jnp.bfloat16)
                for k, v in attn.items()}
    else:
        h, caches = res
    hm = Masked.full(h)
    q_split = model.q_spliter(hm) if model.use_tokens else hm
    z = model.prior_head(q_split, k_prior, temperature=temperature)
    sample_z = z.sample
    if model.transformer_flow is not None:
        sample_z = model.transformer_flow.reverse(sample_z, c=q_split)
    eos = model.is_eos(hm, eos_threshold)[:, -1]
    if return_attn:
        return sample_z.value, caches, eos, attn
    return sample_z.value, caches, eos

"""Autoregressive continuation samplers, compiled to a single program.

Parity target: ``/root/reference/trainers/speech/sampler.py``
(``ARTRSampler``): encode the prompt, prefill with a pushed random
initial state, loop ``length`` AR steps threading KV, concatenate and
diffusion-decode.

TPU-first: the reference's Python loop with dynamically growing KV
becomes (prefill step) + ``lax.scan`` over a **static** KV cache — the
entire prompt→continuation→mel pipeline jits into one XLA program per
(batch, prompt, length) shape, with per-step PRNG splits.  A DiscreteAR
variant covers the token-LM baseline.

PRNG contract (SURVEY §7 "documented PRNG contract"): sampled
continuations are a deterministic function of the single ``key``
argument.  ``key`` splits into (encoder-noise, initial-state, prefill,
diffusion-decode, scan) subkeys; the scan subkey splits into one key
per AR step; inside each step the model splits (prior-noise,
token-multinomial).  The stream is therefore reproducible across runs
and independent of batch position, device count, or mesh layout —
changing ``length`` changes the scan split count and hence the stream
(as re-running the reference's torch loop with a different length
would).  PyTorch's ``randn``/``multinomial`` draws cannot be matched
bit-for-bit; distributional equivalence is what is preserved.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ...core.masked import Masked

Array = jax.Array


def _n_segments(length: int) -> int:
    """Windowed-decode segment count: more segments → tighter
    attention windows (less KV-cache streaming) but more compiled
    scan bodies.  Default 8 ≈ 7% window overhead over the per-step
    minimum at the 150→650 flagship ramp; override with
    ``VAE_GSLM_DECODE_SEGMENTS``."""
    import os as _os

    cap = int(_os.environ.get("VAE_GSLM_DECODE_SEGMENTS", "8"))
    return max(1, min(cap, length // 48))


def _hybrid_scan_segments(model, frame, cache, flushed: int,
                          pos0: int, length: int, keys, step_fn):
    """Segmented AR scan over the hybrid cold/tail cache (shared by
    the LVTR and DiscreteAR samplers): up-to-``TAIL``-step ``lax.scan``
    segments with one static tail→cold flush between them.  ``step_fn``
    is ``(frame, cache, pos, flushed, key) -> (next, cache)``.
    Returns ``(frames (B, length, C), last_frame)``."""
    from ...ops.fused_decode import TAIL

    seg_frames = []
    done = 0
    while done < length:
        if pos0 - flushed == TAIL:
            cache = model.transformer.flush_hybrid(cache, flushed)
            flushed += TAIL
        seg = min(length - done, flushed + TAIL - pos0)

        def body(carry, k_i, flushed=flushed):
            frame, cache, pos = carry
            nxt, cache = step_fn(frame, cache, pos, flushed, k_i)
            return (nxt, cache, pos + 1), frame[:, 0]

        (frame, cache, _), fr = jax.lax.scan(
            body, (frame, cache, jnp.asarray(pos0)),
            keys[done:done + seg])
        seg_frames.append(fr)
        done += seg
        pos0 += seg
    frames = jnp.concatenate(seg_frames, axis=0)
    return jnp.swapaxes(frames, 0, 1), frame


def _select_hybrid(use_stacked: bool, kv_dtype, return_attn: bool):
    """(use_hybrid, interpret): hybrid cold/tail Pallas decode is the
    TPU default for the int8 cache; VAE_GSLM_HYBRID_DECODE=1 forces it
    elsewhere (kernel in interpret mode — tests), =0 disables."""
    import os as _os

    env = _os.environ.get("VAE_GSLM_HYBRID_DECODE", "auto")
    interpret = jax.default_backend() != "tpu"
    use = (use_stacked and kv_dtype == jnp.int8 and not return_attn
           and {"auto": not interpret, "1": True, "0": False}[env])
    return use, interpret


def _select_packed(batch: int, nheads: int, mesh) -> bool:
    """Lane-packed (T, D, B*H) per-layer caches for the unstacked
    decode path.  At B < 128 XLA assigns the base (B, H, T, D) cache a
    D-minor layout (64 of 128 lanes + a cross-lane reduction: 946 vs
    219 us/step/layer measured at B=64 vs B=128 — r4 trace,
    tools/bench_b64_fold.py); the packed layout keeps N = B*H on the
    lanes at any batch.  Chip A/B (r4): B=64 full pipeline 178x packed
    vs 122x hybrid / 66x base per-layer — but at B=128, where the base
    cache already gets the batch-minor layout, packed REGRESSES the
    headline 311x -> 190x (the (T, D, N) write pattern defeats the
    fast path), so auto gates to B < 128.  TPU-only by default
    (``auto``); VAE_GSLM_PACKED_CACHE=1 forces it elsewhere (CPU
    parity tests), =0 disables.

    Under a mesh the packed N axis is sharded over EVERY mesh axis
    (``parallel/tp.py::constrain_packed_cache`` — decode attention is
    parallel over (batch, head), so cache-sized traffic stays
    device-local and only the tiny per-step q/out rows reshard);
    requires N divisible by the mesh size, with per-SHARD lanes full
    (N / nshards % 128 == 0) for the auto gate."""
    import os as _os

    env = _os.environ.get("VAE_GSLM_PACKED_CACHE", "auto")
    on_tpu = jax.default_backend() == "tpu"
    nshards = 1 if mesh is None else mesh.devices.size
    if (batch * nheads) % nshards:
        return False
    lanes_full = (batch * nheads) % (128 * nshards) == 0
    return {
        "auto": on_tpu and lanes_full and batch < 128,
        "1": True, "0": False}[env]


def _select_mega(use_stacked: bool, kv_dtype, return_attn: bool):
    """(use_mega, interpret, max_batch): one-kernel-per-step trunk
    decode (``ops/mega_step.py``) — the B<=32 serving default on TPU
    with int8 KV + int8 weights (152x/191x/209x RTF at B=8/16/32 vs
    97-115x hybrid, PERFORMANCE.md; B=(32,64] serves as sequential
    B=32 chunks — ``ARTRSampler._serving_chunk``).
    VAE_GSLM_MEGA_DECODE=1 forces it elsewhere (interpret mode —
    tests), =0 disables; VAE_GSLM_MEGA_MAX_BATCH bounds the batch
    (VMEM slots scale with B)."""
    import os as _os

    env = _os.environ.get("VAE_GSLM_MEGA_DECODE", "auto")
    interpret = jax.default_backend() != "tpu"
    use = (use_stacked and kv_dtype == jnp.int8 and not return_attn
           and {"auto": not interpret, "1": True, "0": False}[env])
    # B=8: 152x vs 97x hybrid; B=16: 179x; B=32: 209x vs 115x hybrid
    # (r4 — the old 100 MB Pallas vmem cap, not hardware, was the
    # B=32 compile failure; see tools/probe_mega_vmem.py).  B=64
    # still loses to hybrid (slot-ring DMAs serialize behind the
    # attention dots).
    cap = int(_os.environ.get("VAE_GSLM_MEGA_MAX_BATCH", "32"))
    return use, interpret, cap


def _mega_scan_segments(model, frame, cache, flushed: int,
                        pos0: int, length: int, keys, step_fn):
    """Segmented AR scan over the three-tier mega cache: 8-step
    ``lax.scan`` groups with one stage→tail merge per group (nested
    scan for full segments), and a static tail→cold flush every 128
    steps.  ``step_fn`` is ``(frame, cache, pos, flushed, key) ->
    (next, cache)``.  Returns ``(frames (B, length, C), last)``."""
    from ...ops.mega_step import (BLK, STAGE, flush_mega,
                                  merge_stage)

    seg_frames = []
    done = 0
    while done < length:
        if pos0 - flushed == BLK:
            cache = flush_mega(cache, flushed)
            flushed += BLK
        rel = pos0 - flushed

        def body(carry, k_i, flushed=flushed):
            frame, cache, pos = carry
            nxt, cache = step_fn(frame, cache, pos, flushed, k_i)
            return (nxt, cache, pos + 1), frame[:, 0]

        if rel % STAGE:
            # partial group up to the next 8-row boundary
            seg = min(length - done, STAGE - rel % STAGE)
            (frame, cache, _), fr = jax.lax.scan(
                body, (frame, cache, jnp.asarray(pos0)),
                keys[done:done + seg])
            if (rel + seg) % STAGE == 0:
                cache = merge_stage(cache, rel + seg - STAGE)
        else:
            ngroups = min(length - done, BLK - rel) // STAGE
            if ngroups == 0:
                # fewer than 8 steps remain: no merge needed
                seg = length - done
                (frame, cache, _), fr = jax.lax.scan(
                    body, (frame, cache, jnp.asarray(pos0)),
                    keys[done:done + seg])
            else:
                seg = ngroups * STAGE

                def group(carry, g_keys, flushed=flushed):
                    frame, cache, pos = carry
                    (frame, cache, pos), fr = jax.lax.scan(
                        body, (frame, cache, pos), g_keys)
                    cache = merge_stage(
                        cache, pos - flushed - STAGE)
                    return (frame, cache, pos), fr

                (frame, cache, _), fr = jax.lax.scan(
                    group, (frame, cache, jnp.asarray(pos0)),
                    keys[done:done + seg].reshape(
                        (ngroups, STAGE) + keys.shape[1:]))
                fr = fr.reshape((seg,) + fr.shape[2:])
        seg_frames.append(fr)
        done += seg
        pos0 += seg
    frames = jnp.concatenate(seg_frames, axis=0)
    return jnp.swapaxes(frames, 0, 1), frame


class ARTRSampler:
    """Sampler for LVTR-family models.

    ``kv_dtype``: cache dtype; ``jnp.int8`` enables the quantized KV
    cache (halves decode HBM traffic, small numeric delta).

    ``mesh``: optional ``jax.sharding.Mesh`` for multi-chip serving —
    a 1-D ``data`` mesh shards the batch; a 2-D ``(data, model)`` mesh
    additionally tensor-shards the trunk weights (``parallel/tp.py``) —
    the decode path is plain XLA einsums, so GSPMD partitions the KV
    cache and attention on the head axis that follows the qkv sharding.

    ``quantize_weights=True`` converts the trunk projections to
    weight-only int8 in place (per-out-channel scales): weights stream
    ~400 MB/step bf16 at the flagship scale and dominate AR decode at
    small serving batches.  Mutates the model (inference-only).
    """

    def __init__(self, model, kv_dtype=None, mesh=None,
                 quantize_weights=False):
        self.model = model
        self.kv_dtype = kv_dtype
        self.mesh = mesh
        if quantize_weights:
            model.transformer.quantize_weights_int8()
        self.has_utterance = getattr(model, "utterance_net", None) \
            is not None
        self.use_tokens = getattr(model, "use_tokens", False)
        self._compiled = {}

    def _place(self, state, prior: Masked):
        if self.mesh is None:
            return state, prior
        from ...parallel import mesh as mesh_lib
        state = mesh_lib.place_params(state, self.mesh)
        sharded = mesh_lib.shard_batch(
            {"v": prior.value, "l": prior.lengths}, self.mesh)
        return state, Masked(sharded["v"], sharded["l"],
                             prior.time_axis)

    def _run_hybrid(self, model, stacked, enc: Masked, length: int,
                    k_init, k_pre, k_scan, temperature,
                    token_temperature, truncated_norm,
                    interpret: bool):
        """AR loop over the hybrid cold/tail cache
        (``TransformerLayerStack.decode_hybrid``): prefill on the
        stacked head-major cache, convert, then up-to-128-step
        segments with one static tail->cold flush between them."""
        b, tp = enc.value.shape[0], enc.value.shape[1]
        kw = dict(temperature=temperature,
                  token_temperature=token_temperature,
                  truncated_norm=truncated_norm)
        pre_cache = model.init_cache(b, tp + 1, dtype=jnp.int8,
                                     stacked=True)
        out, pre_cache = model.step(enc.value, pre_cache,
                                    jnp.asarray(0), k_pre,
                                    push_init_state=True,
                                    init_key=k_init, stacked=stacked,
                                    **kw)
        frame = out[:, -1:]
        total = tp + 1 + length
        cache, flushed = model.transformer.hybrid_cache_from_prefill(
            pre_cache, tp + 1, total)

        def step_fn(frame, cache, pos, flushed, k_i):
            return model.step_hybrid(frame, stacked, cache, pos,
                                     flushed, k_i,
                                     interpret=interpret, **kw)

        return _hybrid_scan_segments(
            model, frame, cache, flushed, tp + 1, length,
            jax.random.split(k_scan, length), step_fn)

    def _run_mega(self, model, stacked, weights, enc: Masked,
                  length: int, k_init, k_pre, k_scan, temperature,
                  token_temperature, truncated_norm,
                  interpret: bool):
        """AR loop with the whole trunk step as ONE Pallas kernel
        call (``TransformerLayerStack.decode_mega``): prefill on the
        stacked head-major int8 cache, convert to the three-tier mega
        layout, then 8-step merge groups / 128-step flush segments."""
        b, tp = enc.value.shape[0], enc.value.shape[1]
        kw = dict(temperature=temperature,
                  token_temperature=token_temperature,
                  truncated_norm=truncated_norm)
        pre_cache = model.init_cache(b, tp + 1, dtype=jnp.int8,
                                     stacked=True)
        out, pre_cache = model.step(enc.value, pre_cache,
                                    jnp.asarray(0), k_pre,
                                    push_init_state=True,
                                    init_key=k_init, stacked=stacked,
                                    **kw)
        frame = out[:, -1:]
        total = tp + 1 + length
        cache, flushed = model.transformer.mega_cache_from_prefill(
            pre_cache, tp + 1, total)

        def step_fn(frame, cache, pos, flushed, k_i):
            return model.step_mega(frame, weights, cache, pos,
                                   flushed, k_i,
                                   interpret=interpret, **kw)

        return _mega_scan_segments(
            model, frame, cache, flushed, tp + 1, length,
            jax.random.split(k_scan, length), step_fn)

    def _build(self, length: int, temperature: float,
               token_temperature: float, truncated_norm,
               encoder_temperature: float, return_attn: bool):
        graphdef, state = nnx.split(self.model)
        has_utt = self.has_utterance
        use_tokens = self.use_tokens

        # Fused layer-scan decode for small serving batches: stacks the
        # per-layer weights and runs the 16 layers as one lax.scan body
        # (weights stream back-to-back at HBM rate instead of paying
        # ~10 small-op fixed costs per layer; 55x -> 81x RTF at B=8).
        # At large batch the KV-cache traffic dominates and the scan's
        # cache reads/writes cost an extra buffer copy, so the
        # per-layer path (in-place carries, fused slice reads) stays
        # the default there.  Single-mesh only (under TP the per-layer
        # einsums carry the GSPMD shardings).
        use_stacked = (self.mesh is None
                       and self.model.transformer
                           .supports_stacked_decode())
        # Hybrid cold/tail decode: one Pallas attention kernel per
        # layer inside the weight scan (ops/fused_decode.py).
        import os as _os
        use_hybrid, hybrid_interpret = _select_hybrid(
            use_stacked, self.kv_dtype, return_attn)
        use_mega, mega_interpret, mega_cap = _select_mega(
            use_stacked, self.kv_dtype, return_attn)

        @jax.jit
        def run(state, prior: Masked, key: Array):
            model = nnx.merge(graphdef, state)
            (k_enc, k_init, k_pre, k_dec,
             k_scan) = jax.random.split(key, 5)
            u_c = model.encode_utterance(prior) if has_utt else None
            enc = model.encode(prior, k_enc,
                               temperature=encoder_temperature)
            b, tp = enc.value.shape[0], enc.value.shape[1]
            # Crossover measured on v5e (PERFORMANCE.md batch sweep):
            # mega kernel wins B<=32 (209x at 32); the lane-packed
            # per-layer path wins at B=64 (178x vs 122x hybrid — the
            # r4 packed-layout fix); base per-layer wins at B>=128
            # (311x).  Hybrid remains the stacked fallback below 32
            # when mega is ineligible.
            hybrid_cap = int(_os.environ.get(
                "VAE_GSLM_HYBRID_MAX_BATCH", "32"))
            stacked = (model.transformer.build_stacked_decode()
                       if use_stacked
                       and b <= max(32, hybrid_cap if use_hybrid
                                    else 32) else None)
            # One-kernel-per-step trunk decode: the smallest-batch
            # fast path (int8 weights + int8 KV required).
            # VAE_GSLM_MEGA_W4=1: nibble-packed (int4, group-128
            # scales) weights — halves the per-step weight stream
            # that floors B<=8 serving (opt-in probe; see
            # PERFORMANCE.md round 5 for measurements).
            _w4v = _os.environ.get("VAE_GSLM_MEGA_W4", "0")
            mega = ((model.transformer.build_mega_decode_w4(
                        group=64 if _w4v == "64" else 128)
                     if _w4v not in ("0", "")
                     else model.transformer.build_mega_decode())
                    if use_mega and stacked is not None
                    and b <= mega_cap else None)
            if mega is not None:
                frames, frame_last = self._run_mega(
                    model, stacked, mega, enc, length, k_init,
                    k_pre, k_scan, temperature, token_temperature,
                    truncated_norm, mega_interpret)
                full = jnp.concatenate([enc.value, frames], axis=1)
                full_m = Masked.from_lengths(full,
                                             enc.lengths + length)
                mel = (model.decode(full_m, k_dec, u_c=u_c)
                       if has_utt else model.decode(full_m, k_dec))
                return {"output": mel, "frames": full_m}
            if use_hybrid and stacked is not None and b <= hybrid_cap:
                frames, frame_last = self._run_hybrid(
                    model, stacked, enc, length, k_init, k_pre,
                    k_scan, temperature, token_temperature,
                    truncated_norm, hybrid_interpret)
                full = jnp.concatenate([enc.value, frames], axis=1)
                full_m = Masked.from_lengths(full, enc.lengths + length)
                mel = (model.decode(full_m, k_dec, u_c=u_c)
                       if has_utt else model.decode(full_m, k_dec))
                return {"output": mel, "frames": full_m}
            nheads = (model.transformer.layers[0]
                      .self_attn.nheads)
            caches = model.init_cache(
                b, tp + 1 + length, dtype=self.kv_dtype,
                stacked=stacked is not None,
                packed=(stacked is None
                        and _select_packed(b, nheads, self.mesh)))
            step_kw = dict(temperature=temperature,
                           token_temperature=token_temperature,
                           truncated_norm=truncated_norm,
                           stacked=stacked)
            out, caches = model.step(enc.value, caches, jnp.asarray(0),
                                     k_pre, push_init_state=True,
                                     init_key=k_init, **step_kw)
            frame = out[:, -1:]

            # Segmented scan: decode attention for segment i reads only
            # cache[:, :, :window_i] — ~30% less KV-cache HBM traffic
            # than attending over the full preallocated cache each step
            # (the dominant cost of AR decode at this scale).  With
            # ``return_attn`` a single full-window segment is used so
            # the per-step attention rows have one static shape.
            max_len = tp + 1 + length
            n_seg = 1 if return_attn else _n_segments(length)
            bounds = [round(length * (i + 1) / n_seg)
                      for i in range(n_seg)]
            keys = jax.random.split(k_scan, length)
            carry = (frame, caches, jnp.asarray(tp + 1))
            seg_frames = []
            seg_attn = []
            start = 0
            for end in bounds:
                window = min(-(-(tp + 1 + end) // 64) * 64, max_len)

                def body(carry, k_i, window=window):
                    frame, caches, pos = carry
                    res = model.step(frame, caches, pos, k_i,
                                     window=window,
                                     return_attn=return_attn, **step_kw)
                    nxt, caches = res[:2]
                    ys = frame[:, 0]
                    if return_attn:
                        # (L,B,H,1,T) -> (L,B,H,T) bf16 scan rows.
                        ys = (ys, res[2][:, :, :, 0].astype(
                            jnp.bfloat16))
                    return (nxt, caches, pos + 1), ys

                carry, ys = jax.lax.scan(body, carry, keys[start:end])
                if return_attn:
                    fr, at = ys
                    seg_attn.append(at)
                else:
                    fr = ys
                seg_frames.append(fr)
                start = end
            frames = jnp.concatenate(seg_frames, axis=0)
            frames = jnp.swapaxes(frames, 0, 1)       # (B, length, C)
            full = jnp.concatenate([enc.value, frames], axis=1)
            full_m = Masked.from_lengths(
                full, enc.lengths + length)
            mel = model.decode(full_m, k_dec, u_c=u_c) if has_utt else \
                model.decode(full_m, k_dec)
            outputs = {"output": mel, "frames": full_m}
            if return_attn:
                # (steps,L,B,H,T) -> (B,L,H,steps,T); generated steps
                # only (the reference's `attn` list is declared but
                # never filled — trainers/speech/sampler.py:48-49).
                rows = jnp.concatenate(seg_attn, axis=0)
                outputs["attn"] = jnp.transpose(
                    rows, (2, 1, 3, 0, 4)).astype(jnp.float32)
            return outputs

        return run

    def _serving_chunk(self, b: int, return_attn: bool) -> int:
        """Chunk size for chunked-mega serving, or 0.

        At B=64 the one-batch path (lane-packed per-layer cache)
        serves 178.7x while TWO sequential B=32 mega-kernel batches
        project to ~209x from the same-session B=32 measurement —
        the mega kernel's per-step win exceeds the lost batch
        amortization, but its VMEM slot ring caps it at B<=32.  So
        for cap < b <= 2*cap (mega-eligible, single mesh) the sampler
        runs ceil(b/cap) sequential chunks of the compiled cap-batch
        program and concatenates.  ``VAE_GSLM_MEGA_CHUNK``: auto
        (default) / 0 (off) / N (forced chunk size)."""
        import os as _os

        env = _os.environ.get("VAE_GSLM_MEGA_CHUNK", "auto")
        if env == "0" or return_attn or self.mesh is not None:
            return 0
        if env != "auto":
            c = int(env)
            return c if 0 < c < b else 0
        use_stacked = self.model.transformer.supports_stacked_decode()
        use_mega, _, cap = _select_mega(use_stacked, self.kv_dtype,
                                        return_attn)
        if not use_mega or \
                not self.model.transformer.supports_mega_decode():
            return 0
        return cap if cap < b <= 2 * cap else 0

    def __call__(self, length: int, prior: Masked, key: Array,
                 temperature: float = 1.0,
                 token_temperature: float = 1.0,
                 truncated_norm: Optional[Tuple[float, float]] = None,
                 encoder_temperature: float = 1.0,
                 return_attn: bool = False,
                 ) -> Dict[str, Any]:
        b = prior.value.shape[0]
        chunk = self._serving_chunk(b, return_attn)
        if chunk:
            n = -(-b // chunk)
            keys = jax.random.split(key, n)
            outs = []
            for i in range(n):
                sub = Masked(prior.value[i * chunk:(i + 1) * chunk],
                             prior.lengths[i * chunk:(i + 1) * chunk],
                             prior.time_axis)
                outs.append(self(
                    length, sub, keys[i], temperature=temperature,
                    token_temperature=token_temperature,
                    truncated_norm=truncated_norm,
                    encoder_temperature=encoder_temperature,
                    return_attn=return_attn))

            def cat(vals):
                if isinstance(vals[0], Masked):
                    return Masked(
                        jnp.concatenate([v.value for v in vals], 0),
                        jnp.concatenate([v.lengths for v in vals], 0),
                        vals[0].time_axis)
                return jnp.concatenate(vals, 0)

            return {k: cat([o[k] for o in outs]) for k in outs[0]}
        sig = (length, temperature, token_temperature,
               tuple(truncated_norm) if truncated_norm else None,
               encoder_temperature, return_attn)
        if sig not in self._compiled:
            self._compiled[sig] = self._build(
                length, temperature, token_temperature, truncated_norm,
                encoder_temperature, return_attn)
        _, state = nnx.split(self.model)
        state, prior = self._place(state, prior)
        from ...parallel.tp import packed_cache_mesh
        # Ambient during tracing (first call) so the packed per-layer
        # cache picks up its N-axis sharding constraints under a mesh;
        # inert afterwards.
        with packed_cache_mesh(self.mesh):
            return self._compiled[sig](state, prior, key)


class DiscreteARSampler:
    """Sampler for the token-LM baseline (``inference/speech/hubert.py``
    path): SOS prefill + scan, decode via the frozen codec.  ``mesh``
    as in :class:`ARTRSampler`."""

    def __init__(self, model, kv_dtype=None, mesh=None):
        self.model = model
        self.kv_dtype = kv_dtype
        self.mesh = mesh
        self._compiled = {}

    _place = ARTRSampler._place

    def _build(self, length: int, temperature: float):
        graphdef, state = nnx.split(self.model)
        has_f0 = self.model.f0 is not None

        use_stacked = (self.mesh is None
                       and self.model.transformer
                           .supports_stacked_decode())
        use_hybrid, hybrid_interpret = _select_hybrid(
            use_stacked, self.kv_dtype, return_attn=False)
        import os as _os
        # same crossover default as ARTRSampler (measured on the LVTR
        # trunk; the token-LM trunk shares the einsum pattern)
        hybrid_cap = int(_os.environ.get(
            "VAE_GSLM_HYBRID_MAX_BATCH", "32"))

        @jax.jit
        def run(state, prior_tokens: Masked, key: Array):
            model = nnx.merge(graphdef, state)
            k_pre, k_scan = jax.random.split(key)
            if has_f0:
                # prior carries [token, f0] channels.
                ids = prior_tokens.value[..., 0].astype(jnp.int32)
                f0 = prior_tokens.value[..., 1:]
            else:
                ids = prior_tokens.value.astype(jnp.int32)
            b, tp = ids.shape[0], ids.shape[1]
            sos = model.initial_state(b)
            inp = jnp.concatenate([sos, ids], axis=1)
            if has_f0:
                f0_in = jnp.concatenate(
                    [jnp.zeros((b, 1, 1), f0.dtype), f0], axis=1)
                inp = jnp.concatenate(
                    [inp[..., None].astype(jnp.float32), f0_in], -1)
            stacked = (model.transformer.build_stacked_decode()
                       if use_stacked
                       and b <= max(32, hybrid_cap if use_hybrid
                                    else 32) else None)
            if use_hybrid and stacked is not None and b <= hybrid_cap:
                frames, _ = self._run_hybrid(
                    model, stacked, inp, tp, length, k_pre, k_scan,
                    temperature, hybrid_interpret)
                return self._assemble(has_f0, ids, f0 if has_f0
                                      else None, frames,
                                      prior_tokens.lengths, length)
            nheads = (model.transformer.layers[0]
                      .self_attn.nheads)
            caches = model.init_cache(
                b, tp + 1 + length, dtype=self.kv_dtype,
                stacked=stacked is not None,
                packed=(stacked is None
                        and _select_packed(b, nheads, self.mesh)))
            out, caches = model.step(inp, caches, jnp.asarray(0), k_pre,
                                     temperature=temperature,
                                     stacked=stacked)
            frame = out[:, -1:]

            # Windowed segmented scan (see ARTRSampler).
            max_len = tp + 1 + length
            n_seg = _n_segments(length)
            bounds = [round(length * (i + 1) / n_seg)
                      for i in range(n_seg)]
            keys = jax.random.split(k_scan, length)
            carry = (frame, caches, jnp.asarray(tp + 1))
            seg_frames = []
            start = 0
            for end in bounds:
                win = min(-(-(tp + 1 + end) // 64) * 64, max_len)

                def body(carry, k_i, win=win):
                    frame, caches, pos = carry
                    nxt, caches = model.step(frame, caches, pos, k_i,
                                             temperature=temperature,
                                             stacked=stacked,
                                             window=win)
                    return (nxt, caches, pos + 1), frame[:, 0]

                carry, fr = jax.lax.scan(body, carry, keys[start:end])
                seg_frames.append(fr)
                start = end
            frames = jnp.concatenate(seg_frames, axis=0)
            frames = jnp.swapaxes(frames, 0, 1)
            return self._assemble(has_f0, ids, f0 if has_f0 else None,
                                  frames, prior_tokens.lengths, length)

        return run

    def _run_hybrid(self, model, stacked, inp, tp: int, length: int,
                    k_pre, k_scan, temperature: float,
                    interpret: bool):
        """Hybrid cold/tail decode for the token LM (mirrors
        ``ARTRSampler._run_hybrid``): SOS+prompt prefill on the
        stacked int8 cache, convert, then segmented Pallas-attention
        scan via ``DiscreteAR.step_hybrid``."""
        b = inp.shape[0]
        pre_cache = model.init_cache(b, tp + 1, dtype=jnp.int8,
                                     stacked=True)
        out, pre_cache = model.step(inp, pre_cache, jnp.asarray(0),
                                    k_pre, temperature=temperature,
                                    stacked=stacked)
        frame = out[:, -1:]
        cache, flushed = model.transformer.hybrid_cache_from_prefill(
            pre_cache, tp + 1, tp + 1 + length)

        def step_fn(frame, cache, pos, flushed, k_i):
            return model.step_hybrid(frame, stacked, cache, pos,
                                     flushed, k_i,
                                     temperature=temperature,
                                     interpret=interpret)

        return _hybrid_scan_segments(
            model, frame, cache, flushed, tp + 1, length,
            jax.random.split(k_scan, length), step_fn)

    @staticmethod
    def _assemble(has_f0: bool, ids, f0, frames, lengths, length: int):
        if has_f0:
            prior_full = jnp.concatenate(
                [ids[..., None].astype(jnp.float32), f0], axis=-1)
            full = jnp.concatenate([prior_full, frames], axis=1)
        else:
            full = jnp.concatenate([ids, frames], axis=1)
        return Masked.from_lengths(full, lengths + length)

    def __call__(self, length: int, prior_tokens: Masked, key: Array,
                 temperature: float = 1.0) -> Masked:
        sig = (length, temperature)
        if sig not in self._compiled:
            self._compiled[sig] = self._build(length, temperature)
        _, state = nnx.split(self.model)
        state, prior_tokens = self._place(state, prior_tokens)
        return self._compiled[sig](state, prior_tokens, key)

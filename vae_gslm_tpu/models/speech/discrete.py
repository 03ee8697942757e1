"""DiscreteAR — autoregressive token LM baseline (+ inner RVQ decoder).

Parity target: ``/root/reference/models/speech/discrete.py``:
single-VQ: token embedding (+2 specials for SOS/EOS) → causal
transformer → vocab logits; multi-VQ: RVQ embedding + per-step inner
``ARCTransformer`` over codebooks with learned codebook positions;
optional f0 scalar channel + ``f0_dense`` head; SOS = extra embedding
index.  Note the reference imports a non-existent ``SoundStreamIO``
(``discrete.py:7``) making its soundstream/mixed paths dead code — only
the HuBERTIO codec path is live, which is what we implement against.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ...core.masked import Masked
from ...hparams.hp import Hparams
from ...nn.attention import LayerKVCache
from ...nn.linear import Dense, Embedding, RVQEmbedding
from ...nn.transformer import TransformerLayerStack

Array = jax.Array


class ARCTransformer(nnx.Module):
    """Inner per-frame codebook AR transformer
    (``discrete.py:11-76``)."""

    def __init__(self, hp: Hparams, num_quantizers: int,
                 codebook_size: int, embedding_dim: int, *, rngs: nnx.Rngs):
        assert num_quantizers > 1
        self.num_quantizers = num_quantizers
        self.codebook_size = codebook_size
        self.embedding_dim = embedding_dim
        self.pos_encoding = nnx.Param(jax.random.normal(
            rngs.params(), (num_quantizers, embedding_dim), jnp.float32))
        self.transformer = TransformerLayerStack(
            hp, input_dim=embedding_dim, output_dim=codebook_size,
            rngs=rngs)
        self.embedding = Embedding((num_quantizers - 1) * codebook_size,
                                   embedding_dim, rngs=rngs)

    def __call__(self, x: Masked, x_label: Masked) -> Masked:
        """x: (B,T,C) frame latents; x_label: (B,T,n) codes →
        logits (B,T,n,codebook)."""
        b, t, c = x.value.shape
        labels = x_label.value[..., :-1].astype(jnp.int32)
        shift = jnp.arange(self.num_quantizers - 1)[None, None]
        labels = labels + shift * self.codebook_size
        emb = self.embedding.lookup(labels)               # B,T,n-1,C
        inp = jnp.concatenate([x.value[:, :, None], emb], axis=2)
        inp = inp.reshape(b * t, self.num_quantizers, self.embedding_dim)
        inp = inp + self.pos_encoding[...][None]
        out = self.transformer(Masked.full(inp))
        out = out.value.reshape(b, t, self.num_quantizers,
                                self.codebook_size)
        return Masked(out, x.lengths, 1).apply_mask()

    def step(self, frame: Array, prev_codes: List[Array]) -> Array:
        """frame: (B, C); prev_codes: list of (B,) sampled codes →
        logits (B, codebook) for the next code."""
        b = frame.shape[0]
        parts = [frame[:, None]]
        if prev_codes:
            labels = jnp.stack(prev_codes, axis=-1).astype(jnp.int32)
            shift = jnp.arange(len(prev_codes))[None]
            labels = labels + shift * self.codebook_size
            parts.append(self.embedding.lookup(labels))
        inp = jnp.concatenate(parts, axis=1)
        inp = inp + self.pos_encoding[...][None, : inp.shape[1]]
        out = self.transformer(Masked.full(inp))
        return out.value[:, -1]


class DiscreteAR(nnx.Module):
    def __init__(self, hp: Hparams, hp_vq: Hparams,
                 input_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("transformer")
        self.hp = hp
        self.hp_vq = hp_vq
        self.input_dim = input_dim
        self.f0 = hp.get("f0", None)
        self.single_vq = hp_vq.num_quantizers == 1
        tr_dim = hp.transformer.layer.dim
        if not self.single_vq:
            hp.check_arg_in_hparams("arc_transformer")
            self.embedding = RVQEmbedding(hp_vq.num_quantizers,
                                          hp_vq.codebook_size + 2,
                                          hp_vq.dim, rngs=rngs)
            self.transformer = TransformerLayerStack(
                hp.transformer, input_dim=hp_vq.dim, rngs=rngs)
            self.arc_transformer = ARCTransformer(
                hp.arc_transformer, hp_vq.num_quantizers,
                hp_vq.codebook_size, tr_dim, rngs=rngs)
        else:
            in_dim = hp_vq.dim + (1 if self.f0 is not None else 0)
            self.embedding = Embedding(hp_vq.codebook_size + 2, hp_vq.dim,
                                       rngs=rngs)
            self.transformer = TransformerLayerStack(
                hp.transformer, input_dim=in_dim,
                output_dim=hp_vq.codebook_size, rngs=rngs)
        self.f0_dense = (Dense(tr_dim, 1, rngs=rngs)
                         if self.f0 is not None else None)
        self.codec = None  # HuBERTIO, set via set_soundstream

    def set_soundstream(self, codec) -> None:
        """Attach the frozen codec (``discrete.py:120-125``)."""
        self.codec = codec

    @property
    def sample_ratio(self) -> float:
        return self.codec.sample_ratio

    def initial_state(self, bsize: int) -> Array:
        """SOS = codebook_size index (``discrete.py:234-242``)."""
        shape = ([bsize, 1] if self.single_vq
                 else [bsize, 1, self.hp_vq.num_quantizers])
        return jnp.full(shape, self.hp_vq.codebook_size, jnp.int32)

    def _embed_shifted(self, x: Masked,
                       f0: Optional[Masked]) -> Tuple[Masked,
                                                      Optional[Masked]]:
        init = self.initial_state(x.value.shape[0])
        ids = Masked(x.value.astype(jnp.int32), x.lengths, 1)
        shifted = ids.push(init).pop(1).apply_mask()
        emb = self.embedding(shifted)
        if self.f0 is not None and f0 is not None:
            f0s = f0.push(jnp.zeros(
                (f0.value.shape[0], 1), f0.value.dtype)).pop(1).apply_mask()
            emb = emb.cat(f0s.value[..., None])
            return emb, f0s
        return emb, None

    def __call__(self, x: Masked, c: Optional[Masked] = None,
                 f0: Optional[Masked] = None) -> Dict[str, Any]:
        """Teacher-forced forward → logits + labels
        (``discrete.py:131-165``)."""
        emb, f0s = self._embed_shifted(x, f0)
        out = self.transformer.run(emb, c)
        hidden = out["output"]
        res: Dict[str, Any] = {}
        if self.f0 is not None:
            res["f0"] = Masked(
                self.f0_dense(out["layers"][-1].value),
                f0s.lengths, 1)
        if self.single_vq:
            logits = hidden
        else:
            logits = self.arc_transformer(hidden, x)
        res["logits"] = logits
        res["labels"] = Masked(x.value.astype(jnp.int32), x.lengths, 1)
        return res

    # ------------------------------------------------------------------
    def init_cache(self, batch: int, max_len: int,
                   dtype=None, stacked: bool = False,
                   packed: bool = False):
        if stacked:
            return self.transformer.init_stacked_cache(batch, max_len,
                                                       dtype)
        return self.transformer.init_cache(batch, max_len, dtype,
                                           packed=packed)

    def step(self, xv: Array, caches, pos: Array,
             key: Array, temperature: float = 1.0,
             window: Optional[int] = None,
             return_attn: bool = False,
             stacked=None):
        """One AR step over the static cache (``discrete.py:167-214``).

        xv: (B, S) token ids (single-VQ) or (B, S, 1+1) [token, f0].
        Returns sampled next tokens (B, S) (or with f0 channel) and the
        updated caches; with ``return_attn`` also the stacked
        per-layer attention maps (L, B, H, S, max_len).
        """
        if self.f0 is not None:
            f0 = xv[..., -1:]
            ids = xv[..., 0].astype(jnp.int32)
        else:
            ids = xv.astype(jnp.int32)
        emb = self.embedding.lookup(ids)
        if self.f0 is not None:
            emb = jnp.concatenate([emb, f0.astype(emb.dtype)], axis=-1)
        if stacked is not None:
            res = self.transformer.decode_stacked(
                emb, stacked, caches, pos, window=window,
                return_attn=return_attn)
        else:
            res = self.transformer.decode(emb, caches, pos,
                                          window=window,
                                          return_attn=return_attn)
        if return_attn:
            h, caches, attn = res
        else:
            h, caches = res
        out = self._sample_from_hidden(h, key, temperature)
        if return_attn:
            return out, caches, attn["self_attn"]
        return out, caches

    def _sample_from_hidden(self, h: Array, key: Array,
                            temperature: float) -> Array:
        """Sample next tokens (+ f0) from the trunk's decode output —
        shared tail of ``step`` / ``step_hybrid`` (same PRNG use, so
        the paths are sample-for-sample comparable)."""
        if self.single_vq:
            logits = h.astype(jnp.float32)
            sample = jax.random.categorical(key, logits / temperature,
                                            axis=-1)
        else:
            # Inner codebook AR (last position only, S == 1).
            frame = h[:, -1]
            codes: List[Array] = []
            for i in range(self.hp_vq.num_quantizers):
                logits = self.arc_transformer.step(frame, codes).astype(
                    jnp.float32)
                codes.append(jax.random.categorical(
                    jax.random.fold_in(key, i), logits / temperature,
                    axis=-1))
            sample = jnp.stack(codes, axis=-1)[:, None]
        if self.f0 is not None:
            f0_out = self.f0_dense(h).astype(jnp.float32)
            return jnp.concatenate(
                [sample[..., None].astype(jnp.float32), f0_out], -1)
        return sample

    def step_hybrid(self, xv: Array, stacked, cache: dict, pos: Array,
                    flushed: int, key: Array,
                    temperature: float = 1.0,
                    interpret: bool = False):
        """``step`` over the hybrid cold/tail cache with per-layer
        Pallas attention (``TransformerLayerStack.decode_hybrid``) —
        the small-serving-batch fast path (mirrors
        ``models/speech/lvtr.py:step_hybrid``)."""
        if self.f0 is not None:
            f0 = xv[..., -1:]
            ids = xv[..., 0].astype(jnp.int32)
        else:
            ids = xv.astype(jnp.int32)
        emb = self.embedding.lookup(ids)
        if self.f0 is not None:
            emb = jnp.concatenate([emb, f0.astype(emb.dtype)], axis=-1)
        h, cache = self.transformer.decode_hybrid(
            emb, stacked, cache, pos, flushed, interpret=interpret)
        return self._sample_from_hidden(h, key, temperature), cache

    # ------------------------------------------------------------------
    def decode(self, x: Masked, key: Optional[Array] = None,
               spkr: Optional[Masked] = None) -> Masked:
        """Tokens → waveform via the frozen codec
        (``discrete.py:216-227``)."""
        kwargs = {}
        if self.f0 is not None:
            f0 = Masked(x.value[..., -1], x.lengths, 1)
            x = Masked(x.value[..., 0].astype(jnp.int32), x.lengths, 1)
            kwargs["f0"] = f0
        if spkr is not None:
            kwargs["spkr"] = spkr
        return self.codec.decode(x, key=key, **kwargs).apply_mask()

    def encode(self, x: Masked, temperature: float = 1.0) -> Masked:
        return self.codec.encode_mel(x).apply_mask()

    def likelihood(self, x: Masked,
                   f0: Optional[Masked] = None) -> Array:
        out = self(x, f0=f0)
        logits, labels = out["logits"], out["labels"]
        logp = jax.nn.log_softmax(logits.value.astype(jnp.float32),
                                  axis=-1)
        lp = jnp.take_along_axis(logp, labels.value[..., None],
                                 axis=-1)[..., 0]
        lp = jnp.where(logits.mask(), lp, 0.0)
        return lp.sum(-1) / logits.lengths

"""LVTR — the VAE-GSLM model (variational speech LM).

Parity target: ``/root/reference/models/speech/lvtr.py``.  Pipeline:
mel → conv encoder → Gaussian posterior q(z|x); [token, z] teacher-forced
(shifted right with a random-uniform initial state) through a causal
transformer trunk; Gaussian prior head p(z_t|z_<t) optionally warped by a
conditional coupling flow; token CE head; conditional diffusion decoder
reconstructs mels from [token-emb ⊕ fused latent (⊕ utterance emb)].

TPU-first notes:
  * All sampling takes explicit PRNG keys (reproducible, scan-friendly).
  * ``step`` runs over the static transformer KV cache so the AR loop
    compiles to a single ``lax.scan`` (see inference/speech sampler).
  * Distribution math is fp32; trunk/conv matmuls follow the global
    precision policy (bf16 on TPU).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ...core.losses import masked_ce_loss
from ...core.masked import Masked, resize_length
from ...hparams.hp import Hparams
from ...nn.attention import LayerKVCache
from ...nn.conv import BottleNeckResNet, CNNStack, ResNet
from ...nn.diffusion import GaussianDiffusion1D
from ...nn.flow import CouplingStack, TensorLogdet
from ...nn.linear import (Embedding, GaussianParameterize, Linear,
                          TimeAggregation)
from ...nn.transformer import TransformerLayerStack
from ...nn.unet import ConditionalBottleNeckUNet, ConditionalUNet

Array = jax.Array
LOG_2PI = math.log(2.0 * math.pi)

_ENCODERS = {
    "BottleNeckResNet": BottleNeckResNet,
    "ResNet": ResNet,
    "CNNStack": CNNStack,
}


class LVTR(nnx.Module):
    def __init__(self, hp: Hparams, input_dim: Optional[int] = None,
                 memory_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("encoder", "decoder", "transformer",
                                "latent_dim")
        self.hp = hp
        self.input_dim = input_dim
        self.latent_dim = hp.latent_dim
        enc_id = hp.encoder.get("identifier", "ResNet")
        if enc_id not in _ENCODERS:
            raise ValueError(f"{enc_id} not recognized.")
        self.encoder_net = _ENCODERS[enc_id](
            hp.encoder, input_dim=input_dim, output_dim=hp.latent_dim,
            rngs=rngs)
        self.encoder_head = GaussianParameterize(
            hp.latent_dim, hp.latent_dim,
            std=hp.encoder.get("fix_std", None),
            std_range=hp.encoder.get("std_range", None),
            truncated_norm=hp.encoder.get("truncated_norm", None),
            total_std=hp.encoder.get("total_std", None),
            use_tanh=False,
            normalization=hp.encoder.get("normalization", False),
            rngs=rngs)

        self.tokens_hp = hp.get("tokens", None)
        self.use_tokens = self.tokens_hp is not None
        tr_dim = hp.transformer.layer.dim
        if self.use_tokens:
            self.tokens_hp.check_arg_in_hparams("embedding_dim",
                                                "vocab_size")
            self.token_embedding_dim = self.tokens_hp.embedding_dim
            self.token_embedding = Embedding(
                self.tokens_hp.vocab_size, self.tokens_hp.embedding_dim,
                rngs=rngs)
            self.token_predictor = Linear(tr_dim,
                                          self.tokens_hp.vocab_size,
                                          rngs=rngs)
            self.token_fuser = Linear(hp.latent_dim,
                                      self.tokens_hp.embedding_dim,
                                      activation=jax.nn.relu, rngs=rngs)
            self.token_spliter = Linear(tr_dim, tr_dim,
                                        activation=jax.nn.relu, rngs=rngs)
            self.q_spliter = Linear(tr_dim, tr_dim,
                                    activation=jax.nn.relu, rngs=rngs)
        else:
            self.q_spliter = None

        diff_cond_dim = hp.latent_dim
        if self.use_tokens:
            diff_cond_dim = self.tokens_hp.embedding_dim
        if hp.has("utterance_encoder"):
            diff_cond_dim += hp.utterance_encoder.embedding_dim
        dec_id = hp.decoder.diffusion.get("identifier", "ConditionalUNet")
        hp.decoder.check_arg_in_hparams("cond_unet")
        if dec_id == "ConditionalBottleNeckUNet":
            denoiser = ConditionalBottleNeckUNet(
                diff_cond_dim, input_dim, hp.decoder.cond_unet, rngs=rngs)
        elif dec_id == "ConditionalUNet":
            denoiser = ConditionalUNet(
                diff_cond_dim, input_dim, hp.decoder.cond_unet, rngs=rngs)
        else:
            raise ValueError(f"{dec_id} not recognized.")
        self.decoder = GaussianDiffusion1D(denoiser, hp.decoder.diffusion)
        self.diff_scaling = hp.decoder.diffusion.get("input_scale", 1.0)

        if hp.transformer.has("flow"):
            cond_dim = tr_dim if hp.transformer.flow.get(
                "conditional", False) else None
            self.transformer_flow = CouplingStack(
                hp.latent_dim, hp.transformer.flow,
                condition_dim=cond_dim, rngs=rngs)
        else:
            self.transformer_flow = None

        tr_input_dim = (self.tokens_hp.embedding_dim if self.use_tokens
                        else hp.latent_dim)
        self.transformer = TransformerLayerStack(
            hp.transformer, input_dim=tr_input_dim, memory_dim=memory_dim,
            rngs=rngs)
        self.prior_head = GaussianParameterize(
            tr_dim, hp.latent_dim,
            std=hp.transformer.get("fix_std", None),
            std_range=hp.transformer.get("std_range", None),
            use_tanh=False,
            mean=hp.transformer.get("fix_mean", None), rngs=rngs)

        if hp.has("utterance_encoder"):
            self.utterance_net = CNNStack(
                hp.utterance_encoder, input_dim=input_dim,
                output_dim=hp.utterance_encoder.embedding_dim, rngs=rngs)
            self.utterance_pool = TimeAggregation()
        else:
            self.utterance_net = None

    # ------------------------------------------------------------------
    @property
    def sample_ratio(self) -> float:
        return self.encoder_net.sample_ratio

    def split_inputs(self, x: Masked) -> Tuple[Masked, Masked]:
        return x.split(1)

    def fuse_inputs(self, latents: Masked, token_emb: Masked) -> Masked:
        return token_emb + self.token_fuser(latents)

    def initial_state(self, key: Array, bsize: int,
                      nfeat: Optional[int] = None) -> Array:
        if nfeat is None:
            nfeat = (self.token_embedding_dim if self.use_tokens
                     else self.latent_dim)
        return jax.random.uniform(key, (bsize, 1, nfeat), jnp.float32,
                                  -1.0, 1.0)

    def _embed_tokens(self, tokens_id: Masked) -> Masked:
        ids = Masked(tokens_id.value[..., 0].astype(jnp.int32),
                     tokens_id.lengths, 1)
        return self.token_embedding(ids)

    # ------------------------------------------------------------------
    def __call__(self, x: Masked, key: Array,
                 c: Optional[Masked] = None,
                 utterance: Optional[Masked] = None,
                 diff_input: Optional[Masked] = None
                 ) -> Dict[str, Any]:
        """Training forward (``lvtr.py:143-225``): returns loss stats."""
        k_enc, k_init, k_prior, k_diff, k_diff_enc = jax.random.split(key,
                                                                      5)
        tokens_id = None
        if self.use_tokens:
            tokens_id, x = self.split_inputs(x)
            token_ids = Masked(tokens_id.value[..., 0].astype(jnp.int32),
                               tokens_id.lengths, 1)
            tokens = self.token_embedding(token_ids)
        q_z = self.encoder_head(self.encoder_net(x), k_enc)
        sample_q = q_z.sample.apply_mask()
        # Analytic entropy term of q (``lvtr.py:158-159``).
        log_q = -q_z.logstd.value - 0.5 - 0.5 * LOG_2PI
        log_q = Masked(log_q, q_z.logstd.lengths, 1)

        init = self.initial_state(k_init, x.value.shape[0])
        shifted = sample_q
        if self.use_tokens:
            shifted = self.fuse_inputs(shifted, tokens)
        shifted = shifted.shift_right(init).apply_mask()

        trunk = self.transformer(shifted, c)
        q_split = self.q_spliter(trunk) if self.use_tokens else trunk
        z_given = self.prior_head(q_split, k_prior)

        if self.transformer_flow is None:
            log_p = (-z_given.logstd.value - 0.5 * LOG_2PI
                     - 0.5 * jnp.exp(-2.0 * z_given.logstd.value)
                     * jnp.square(sample_q.value.astype(jnp.float32)
                                  - z_given.mean.value))
        else:
            p_z = self.transformer_flow.forward(
                TensorLogdet(sample_q, 0.0), c=q_split)
            sample_p, logdet_p = p_z.tensor, p_z.logdet
            log_p = logdet_p.sum(-1)[..., None] / self.latent_dim
            log_p = (log_p - z_given.logstd.value - 0.5 * LOG_2PI
                     - 0.5 * jnp.exp(-2.0 * z_given.logstd.value)
                     * jnp.square(sample_p.value - z_given.mean.value))
        log_p = Masked(log_p, z_given.logstd.lengths, 1)

        ce_loss = None
        if self.use_tokens:
            pred_tokens = self.token_predictor(self.token_spliter(trunk))
            ce_loss = masked_ce_loss(pred_tokens, token_ids)

        if diff_input is None:
            diffusion_input = sample_q
            xi = x
        else:
            diffusion_input = self.encoder_head(
                self.encoder_net(diff_input), k_diff_enc).sample
            xi = diff_input
        if self.use_tokens:
            diffusion_input = self.fuse_inputs(diffusion_input, tokens)
        u_c = None
        if self.utterance_net is not None:
            u_c = self.utterance_pool(self.utterance_net(utterance))
            uexp = jnp.broadcast_to(
                u_c[:, None],
                (u_c.shape[0], diffusion_input.value.shape[1],
                 u_c.shape[-1]))
            diffusion_input = diffusion_input.cat(uexp)
        rec_loss = self.decoder(
            dataclasses.replace(xi, value=xi.value / self.diff_scaling),
            diffusion_input, k_diff)

        return {
            "log_p": log_p.apply_mask(),
            "log_q": log_q.apply_mask(),
            "rec_loss": rec_loss,
            "sample_q": sample_q,
            "transformer_latent": trunk,
            "logstd": z_given.logstd.mean(),
            "mean": z_given.mean.mean(),
            "q_logstd": q_z.logstd.mean(),
            "q_mean": q_z.mean.mean(),
            "q_mean_abs": q_z.mean.abs().mean(),
            "q_z": q_z,
            "u_c": u_c,
            "ce_loss": ce_loss,
        }

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
             token_temperature: float = 1.0,
             truncated_norm: Optional[Tuple[float, float]] = None,
             push_init_state: bool = False,
             init_key: Optional[Array] = None,
             window: Optional[int] = None,
             return_attn: bool = False,
             stacked=None):
        """One AR step over the static KV cache (``lvtr.py:227-286``).

        xv: (B, S, 1+latent) raw [token, latent] frames (or (B, S,
        latent) without tokens).  Returns sampled next-frame(s)
        (B, S', 1+latent) and updated caches.  With ``push_init_state``
        a random initial state is prepended (S' = S + 1), matching the
        prompt-prefill step of the reference sampler.  With
        ``return_attn`` a third element — the stacked per-layer
        attention maps (L, B, H, S', max_len) — is returned
        (``trainers/speech/sampler.py:48-57`` parity; the reference
        never actually fills its ``attn`` list, we do).
        """
        k_prior, k_tok = jax.random.split(key)
        b, s = xv.shape[0], xv.shape[1]
        if self.use_tokens:
            ids = xv[..., 0].astype(jnp.int32)
            latents = xv[..., 1:]
            emb = self.token_embedding.lookup(ids)
            fused = emb + jax.nn.relu(
                self.token_fuser.dense(latents))
        else:
            fused = xv
        if push_init_state:
            assert init_key is not None
            init = self.initial_state(init_key, b)
            fused = jnp.concatenate(
                [init.astype(fused.dtype), fused], axis=1)
        if stacked is not None:
            # Fused layer-scan decode (stacked weights + stacked cache;
            # ~4x fewer per-op fixed costs at small serving batches).
            res = self.transformer.decode_stacked(
                fused, stacked, caches, pos, window=window,
                return_attn=return_attn)
        else:
            res = self.transformer.decode(fused, caches, pos,
                                          window=window,
                                          return_attn=return_attn)
        if return_attn:
            h, caches, attn = res
        else:
            h, caches = res
        hm = Masked.full(h)
        q_split = self.q_spliter(hm) if self.use_tokens else hm
        z = self.prior_head(q_split, k_prior, temperature=temperature,
                            truncated_norm=truncated_norm)
        sample_z = z.sample
        if self.transformer_flow is not None:
            sample_z = self.transformer_flow.reverse(sample_z, c=q_split)
        out = sample_z.value
        if self.use_tokens:
            logits = self.token_predictor(
                self.token_spliter(hm)).value.astype(jnp.float32)
            tok = jax.random.categorical(
                k_tok, logits / token_temperature, axis=-1)
            out = jnp.concatenate(
                [tok[..., None].astype(jnp.float32), out], axis=-1)
        if return_attn:
            return out, caches, attn["self_attn"]
        return out, caches

    def step_hybrid(self, xv: Array, stacked, cache: dict, pos: Array,
                    flushed: int, key: Array,
                    temperature: float = 1.0,
                    token_temperature: float = 1.0,
                    truncated_norm: Optional[Tuple[float, float]] = None,
                    interpret: bool = False):
        """``step`` over the hybrid cold/tail cache with per-layer
        Pallas attention (``TransformerLayerStack.decode_hybrid``) —
        the small-serving-batch fast path."""
        k_prior, k_tok = jax.random.split(key)
        b = xv.shape[0]
        if self.use_tokens:
            ids = xv[..., 0].astype(jnp.int32)
            latents = xv[..., 1:]
            emb = self.token_embedding.lookup(ids)
            fused = emb + jax.nn.relu(self.token_fuser.dense(latents))
        else:
            fused = xv
        h, cache = self.transformer.decode_hybrid(
            fused, stacked, cache, pos, flushed, interpret=interpret)
        hm = Masked.full(h)
        q_split = self.q_spliter(hm) if self.use_tokens else hm
        z = self.prior_head(q_split, k_prior, temperature=temperature,
                            truncated_norm=truncated_norm)
        sample_z = z.sample
        if self.transformer_flow is not None:
            sample_z = self.transformer_flow.reverse(sample_z,
                                                     c=q_split)
        out = sample_z.value
        if self.use_tokens:
            logits = self.token_predictor(
                self.token_spliter(hm)).value.astype(jnp.float32)
            tok = jax.random.categorical(
                k_tok, logits / token_temperature, axis=-1)
            out = jnp.concatenate(
                [tok[..., None].astype(jnp.float32), out], axis=-1)
        return out, cache

    def step_mega(self, xv: Array, weights, cache: dict, pos: Array,
                  flushed: int, key: Array,
                  temperature: float = 1.0,
                  token_temperature: float = 1.0,
                  truncated_norm: Optional[Tuple[float, float]] = None,
                  interpret: bool = False):
        """``step`` with the whole trunk as ONE Pallas kernel call per
        token (``TransformerLayerStack.decode_mega`` /
        ``ops/mega_step.py``) — the B<=8 serving fast path."""
        k_prior, k_tok = jax.random.split(key)
        if self.use_tokens:
            ids = xv[..., 0].astype(jnp.int32)
            latents = xv[..., 1:]
            emb = self.token_embedding.lookup(ids)
            fused = emb + jax.nn.relu(self.token_fuser.dense(latents))
        else:
            fused = xv
        h, cache = self.transformer.decode_mega(
            fused, weights, cache, pos, flushed, interpret=interpret)
        hm = Masked.full(h)
        q_split = self.q_spliter(hm) if self.use_tokens else hm
        z = self.prior_head(q_split, k_prior, temperature=temperature,
                            truncated_norm=truncated_norm)
        sample_z = z.sample
        if self.transformer_flow is not None:
            sample_z = self.transformer_flow.reverse(sample_z,
                                                     c=q_split)
        out = sample_z.value
        if self.use_tokens:
            logits = self.token_predictor(
                self.token_spliter(hm)).value.astype(jnp.float32)
            tok = jax.random.categorical(
                k_tok, logits / token_temperature, axis=-1)
            out = jnp.concatenate(
                [tok[..., None].astype(jnp.float32), out], axis=-1)
        return out, cache

    # ------------------------------------------------------------------
    def decode(self, x: Masked, key: Array,
               u_c: Optional[Array] = None,
               c: Optional[Masked] = None) -> Masked:
        """Diffusion-decode [token, latent] frames to mels
        (``lvtr.py:288-306``).  ``c`` is accepted for call-site parity
        but unused — the reference declares it and ignores it too
        (its TTS trainer passes the text condition to no effect,
        ``models/speech/lvtr.py:288-306``)."""
        del c
        k_noise, k_samp = jax.random.split(key)
        out_len = int(x.value.shape[1] * (1.0 / self.sample_ratio))
        noise = jax.random.normal(
            k_noise, (x.value.shape[0], out_len, self.input_dim),
            jnp.float32)
        noise = Masked.from_lengths(
            noise, resize_length(x.lengths, 1.0 / self.sample_ratio)
        ).apply_mask()
        if self.use_tokens:
            tokens_id, lat = self.split_inputs(x)
            tokens = self._embed_tokens(tokens_id)
            cond = self.fuse_inputs(lat, tokens)
        else:
            cond = x
        if u_c is not None:
            uexp = jnp.broadcast_to(
                u_c[:, None],
                (u_c.shape[0], cond.value.shape[1], u_c.shape[-1]))
            cond = cond.cat(uexp)
        out = self.decoder.sample(noise, cond.apply_mask(), k_samp)
        return dataclasses.replace(out,
                                   value=out.value * self.diff_scaling)

    def encode(self, x: Masked, key: Array,
               temperature: float = 1.0) -> Masked:
        """mel → [token, latent] (``lvtr.py:308-320``)."""
        tokens_id = None
        if self.use_tokens:
            tokens_id, x = self.split_inputs(x)
        out = self.encoder_head(self.encoder_net(x), key,
                                temperature=temperature).sample
        if self.use_tokens:
            return tokens_id.cat(out.apply_mask())
        return out.apply_mask()

    def encode_utterance(self, utterance: Masked) -> Array:
        if self.use_tokens:
            _, utterance = self.split_inputs(utterance)
        return self.utterance_pool(self.utterance_net(utterance))

    # ------------------------------------------------------------------
    def likelihood(self, x: Masked, key: Array,
                   temperature: float = 0.0) -> Array:
        """Per-utterance pseudo-likelihood (``lvtr.py:337-388``).

        Token branch returns token log-prob per frame; continuous branch
        returns latent log-density per frame (flow-corrected).
        """
        k_enc, k_init, k_prior = jax.random.split(key, 3)
        tokens_id = None
        if self.use_tokens:
            tokens_id, x = self.split_inputs(x)
            token_ids = Masked(tokens_id.value[..., 0].astype(jnp.int32),
                               tokens_id.lengths, 1)
            tokens = self.token_embedding(token_ids)
        q = self.encoder_head(self.encoder_net(x), k_enc,
                              temperature=temperature).sample
        shift_q = q
        if self.use_tokens:
            shift_q = self.fuse_inputs(shift_q, tokens)
        shift_q = shift_q.shift_right(
            self.initial_state(k_init, x.value.shape[0])).apply_mask()
        trunk = self.transformer(shift_q)
        q_split = self.q_spliter(trunk) if self.use_tokens else trunk
        z_given = self.prior_head(q_split, k_prior)
        if self.transformer_flow is not None:
            inv = self.transformer_flow.forward(TensorLogdet(q, 0.0),
                                                c=q_split)
            sample_p, logdet_p = inv.tensor, inv.logdet
            log_p = logdet_p.sum(-1)[..., None] / self.latent_dim
            log_p = (log_p - z_given.logstd.value - 0.5 * LOG_2PI
                     - 0.5 * jnp.exp(-2.0 * z_given.logstd.value)
                     * jnp.square(sample_p.value - z_given.mean.value))
            log_p = Masked(log_p, sample_p.lengths, 1)
        else:
            log_p = (-z_given.logstd.value - 0.5 * LOG_2PI
                     - 0.5 * jnp.exp(-2.0 * z_given.logstd.value)
                     * jnp.square(q.value.astype(jnp.float32)
                                  - z_given.mean.value))
            log_p = Masked(log_p, z_given.mean.lengths, 1)
        ret = (log_p.apply_mask().value.mean(-1).sum(1)
               / log_p.lengths)
        if self.use_tokens:
            logits = self.token_predictor(self.token_spliter(trunk))
            logprobs = jax.nn.log_softmax(
                logits.value.astype(jnp.float32), axis=-1)
            lp = jnp.take_along_axis(
                logprobs, token_ids.value[..., None], axis=-1)[..., 0]
            lp = jnp.where(logits.mask(), lp, 0.0)
            ret = lp.sum(-1) / logits.lengths
        return ret
